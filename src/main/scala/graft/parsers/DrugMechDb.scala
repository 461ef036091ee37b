package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** DrugMechDB mechanism-path parser.
  *
  * Reference (parsers/drugmechdb/src/loadDrugMechDB.py:63-299 +
  * drugmechdb_predicate_map.json / drugmechdb_node_map.json): the
  * indication_paths.json array of {graph, nodes, links} entries:
  *  - every link becomes a mechanism edge; node ids are fixed through
  *    prefix rewrites (UniProt→UniProtKB, taxonomy→NCBITaxon, DB→DRUGBANK
  *    …) and a curated node-mapping table;
  *  - link keys become `biolink:<key with underscores>` then map through
  *    the predicate table to (predicate, qualified_predicate, direction,
  *    aspect) — unmapped keys keep the synthesized curie;
  *  - identical (s, o, predicate+qualifiers) edges across paths merge,
  *    carrying the sorted supporting path ids;
  *  - links leaving the entry's drug whose target node is a Protein or
  *    GeneFamily additionally assert `biolink:target_for` between that
  *    target and the entry's disease.
  *
  * The mapping tables are injectable (defaults cover the common cases;
  * the reference ships full curated JSON files at the same seam).
  */
object DrugMechDb {

  val provenance = "infores:drugmechdb"

  final case class PredicateMapping(predicate: String, qualifiedPredicate: String = "",
                                    directionQualifier: String = "", aspectQualifier: String = "")

  /** Default predicate-map slice (drugmechdb_predicate_map.json shape). */
  val defaultPredicateMapping: Map[String, PredicateMapping] = Map(
    "biolink:affects_risk_for" -> PredicateMapping("biolink:predisposes_to_condition"),
    "biolink:ameliorates" -> PredicateMapping("biolink:ameliorates_condition"),
    "biolink:decreases_activity_of" -> PredicateMapping("biolink:affects",
      "biolink:causes", "decreased", "activity"),
    "biolink:increases_activity_of" -> PredicateMapping("biolink:affects",
      "biolink:causes", "increased", "activity"),
    "biolink:decreases_abundance_of" -> PredicateMapping("biolink:affects",
      "biolink:causes", "decreased", "abundance"),
    "biolink:increases_abundance_of" -> PredicateMapping("biolink:affects",
      "biolink:causes", "increased", "abundance"),
    "biolink:positively_regulates" -> PredicateMapping("biolink:affects",
      "biolink:causes", "upregulated", "activity_or_abundance"),
    "biolink:negatively_regulates" -> PredicateMapping("biolink:affects",
      "biolink:causes", "downregulated", "activity_or_abundance"))

  /** fix_node prefix rewrites (loadDrugMechDB.py:102-111). */
  def fixNode(c: Column, nodeMapping: Map[String, String]): Column = {
    val rewritten = Seq(
      "UniProt:" -> "UniProtKB:", "InterPro:" -> "interpro:",
      "reactome:" -> "REACT:", "taxonomy:" -> "NCBITaxon:",
      "Pfam:" -> "PFAM:", "DB:" -> "DRUGBANK:")
      .foldLeft(regexp_replace(c, "﻿", "")) { case (acc, (from, to)) =>
        when(acc.startsWith(from), concat(lit(to), acc.substr(lit(from.length + 1), lit(4096))))
          .otherwise(acc)
      }
    nodeMapping.foldLeft(rewritten) { case (acc, (from, to)) =>
      when(acc === from, lit(to)).otherwise(acc)
    }
  }

  def parse(spark: SparkSession, path: String,
            predicateMapping: Map[String, PredicateMapping] = defaultPredicateMapping,
            nodeMapping: Map[String, String] = Map.empty): ExtractedGraph = {
    val entries = spark.read.option("multiLine", "true").json(path)

    val links = entries.select(
        col("graph._id").as("path_id"),
        col("graph.drug_mesh").as("drug_mesh"),
        fixNode(col("graph.disease_mesh"), nodeMapping).as("disease_id"),
        col("nodes").as("path_nodes"),
        explode(col("links")).as("link"))
      .select(col("path_id"), col("drug_mesh"), col("disease_id"), col("path_nodes"),
        col("link.source").as("raw_source"), col("link.target").as("raw_target"),
        col("link.key").as("key"))
      .localCheckpoint() // mechanism and target_for branches both re-enter

    val synthesized = concat(lit("biolink:"), regexp_replace(col("key"), " ", "_"))
    val mapped = predicateMapping.toSeq
    def prop(f: PredicateMapping => String): Column =
      mapped.foldLeft(lit("")) { case (acc, (k, v)) =>
        when(synthesized === k, lit(f(v))).otherwise(acc) }
    val predicate = mapped.foldLeft(synthesized) { case (acc, (k, v)) =>
      when(synthesized === k, lit(v.predicate)).otherwise(acc) }

    val mechanism = links
      .select(
        fixNode(col("raw_source"), nodeMapping).as(Biolink.Subject),
        predicate.as(Biolink.Predicate),
        fixNode(col("raw_target"), nodeMapping).as(Biolink.Object_),
        when(prop(_.qualifiedPredicate) =!= "", prop(_.qualifiedPredicate)).as("qualified_predicate"),
        when(prop(_.directionQualifier) =!= "", prop(_.directionQualifier)).as("object_direction_qualifier"),
        when(prop(_.aspectQualifier) =!= "", prop(_.aspectQualifier)).as("object_aspect_qualifier"),
        col("path_id"))
      .groupBy(col(Biolink.Subject), col(Biolink.Predicate), col(Biolink.Object_),
        col("qualified_predicate"), col("object_direction_qualifier"), col("object_aspect_qualifier"))
      .agg(array_sort(collect_set(col("path_id"))).as("drugmechdb_path_id"))
      .select(col(Biolink.Subject), col(Biolink.Predicate), col(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        col("qualified_predicate"), col("object_direction_qualifier"),
        col("object_aspect_qualifier"), col("drugmechdb_path_id"),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit(Biolink.ManualAgent).as(Biolink.AgentType))

    // drug → protein/gene-family target ⇒ target_for(target, disease)
    val targetFor = links
      .filter(col("raw_source") === col("drug_mesh"))
      .select(col("disease_id"), col("path_id"),
        explode(filter(col("path_nodes"),
          n => n.getField("id") === col("raw_target") &&
            n.getField("label").isin("Protein", "GeneFamily"))).as("target_node"))
      .select(fixNode(col("target_node.id"), nodeMapping).as(Biolink.Subject),
        col("disease_id").as(Biolink.Object_), col("path_id"))
      .groupBy(col(Biolink.Subject), col(Biolink.Object_))
      .agg(array_sort(collect_set(col("path_id"))).as("drugmechdb_path_id"))
      .select(col(Biolink.Subject), lit("biolink:target_for").as(Biolink.Predicate),
        col(Biolink.Object_), lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        lit(null).cast("string").as("qualified_predicate"),
        lit(null).cast("string").as("object_direction_qualifier"),
        lit(null).cast("string").as("object_aspect_qualifier"),
        col("drugmechdb_path_id"),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val edges = mechanism.unionByName(targetFor)
    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
