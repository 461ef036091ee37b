package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor
import graft.extract.Extractor.{EdgeRule, ExtractedGraph, Extraction}
import graft.model.Biolink

/** GOA GAF parser (gene product → GO term annotations).
  *
  * Reference semantics (parsers/GOA/src/loadGOA.py:14-77,153-228):
  *  - GAF 2.2: 17 tab-separated columns, '!' comment lines;
  *  - subject id = DB_Object_ID if already a curie, else DB:DB_Object_ID;
  *  - predicate: multi-valued qualifier (negation, `NOT|enables`) → row
  *    dropped; empty qualifier → aspect default (F=enables, P=involved_in,
  *    C=located_in); otherwise the GOA relation → RO/BFO curie map;
  *  - subject gets `taxon` = NCBITaxon curie from the taxon column;
  *  - evidence code → (knowledge_level, agent_type), unknown codes →
  *    not_provided;
  *  - PMID entries of DB_Reference become `publications`;
  *  - optional taxon filter set (HumanGOA/MouseGOA subclasses).
  */
object Goa {

  val provenance = "infores:goa"

  val columns: Seq[String] = Seq(
    "db", "db_object_id", "db_object_symbol", "qualifier", "go_id",
    "db_reference", "evidence_code", "with_from", "aspect", "db_object_name",
    "db_object_synonym", "db_object_type", "taxon", "date", "assigned_by",
    "annotation_extension", "gene_product_form_id")

  /** GOA relation → predicate curie (loadGOA.py:35-47). */
  val predicates: Map[String, String] = Map(
    "enables" -> "RO:0002327",
    "involved_in" -> "RO:0002331",
    "located_in" -> "RO:0001025",
    "contributes_to" -> "RO:0002326",
    "acts_upstream_of" -> "RO:0002263",
    "part_of" -> "BFO:0000050",
    "acts_upstream_of_positive_effect" -> "RO:0004034",
    "is_active_in" -> "RO:0002432",
    "acts_upstream_of_negative_effect" -> "RO:0004035",
    "colocalizes_with" -> "RO:0002325",
    "acts_upstream_of_or_within" -> "RO:0002264",
    "acts_upstream_of_or_within_positive_effect" -> "RO:0004032",
    "acts_upstream_of_or_within_negative_effect" -> "RO:0004033")

  /** evidence code → (knowledge_level, agent_type) (loadGOA.py:49-77). */
  val evidenceToKlAt: Map[String, (String, String)] = {
    val ka = (Biolink.KnowledgeAssertion, Biolink.ManualAgent)
    val predMv = (Biolink.Prediction, Biolink.ManualValidationOfAutomatedAgent)
    val predManual = (Biolink.Prediction, Biolink.ManualAgent)
    Map(
      "EXP" -> ka, "IDA" -> ka, "IPI" -> ka, "IMP" -> ka, "IGI" -> ka,
      "IEP" -> ka, "HTP" -> ka, "HDA" -> ka, "HMP" -> ka, "HGI" -> ka,
      "HEP" -> ka, "IKR" -> ka, "TAS" -> ka,
      "IBA" -> predMv, "IBD" -> predMv, "ISS" -> predMv, "ISO" -> predMv,
      "ISA" -> predMv, "ISM" -> predMv, "RCA" -> predMv,
      "IRD" -> predManual, "IGC" -> predManual, "NAS" -> predManual,
      "IC" -> predManual,
      "ND" -> (Biolink.NotProvided, Biolink.NotProvided),
      "IEA" -> (Biolink.Prediction, Biolink.AutomatedAgent))
  }

  private def mapLookup(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  /** One-taxon-per-line filter file → set (PlantGOA's plant_taxa.txt;
    * ref parsers/GOA/src/loadGOA.py:274-280). */
  def taxaSet(path: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .asScala.map(_.trim).filter(_.nonEmpty).toSet
  }

  /** gaf(.gz) scan: headerless, '!' comments (Spark reads .gz transparently). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("sep", "\t").option("header", "false").option("comment", "!")
      .csv(path)
    columns.zipWithIndex.foldLeft(raw) { case (df, (name, i)) =>
      df.withColumnRenamed(s"_c$i", name)
    }
  }

  def parse(spark: SparkSession, path: String,
            taxonFilter: Option[Set[String]] = None): ExtractedGraph = {
    val base0 = read(spark, path)
    val base = taxonFilter match {
      case Some(ts) => Extractor.filterBySet(base0, col("taxon"), ts)
      case None => base0
    }

    val subjectId = when(col("db_object_id").contains(":"), col("db_object_id"))
      .otherwise(concat(col("db"), lit(":"), col("db_object_id")))

    // negation (multi-valued qualifier) → null predicate → row dropped by
    // the extractor, matching get_goa_predicate (loadGOA.py:207-222)
    val predicate =
      when(col("qualifier").isNotNull && col("qualifier").contains("|"), lit(null).cast("string"))
        .when(col("qualifier").isNull || (col("qualifier") === ""),
          when(col("aspect") === "F", predicates("enables"))
            .when(col("aspect") === "P", predicates("involved_in"))
            .when(col("aspect") === "C", predicates("located_in")))
        .otherwise(mapLookup(col("qualifier"), predicates))

    val taxonProp = {
      val t = element_at(split(element_at(split(col("taxon"), "\\|"), 1), ":"), -1)
      when(t.isNotNull && t =!= "", concat(lit("NCBITaxon:"), t))
    }

    val publications = filter(split(col("db_reference"), "\\|"), r => r.contains("PMID"))
    val klat = evidenceToKlAt.toSeq

    Extractor.extract(base, Extraction(
      subjectId = subjectId,
      subjectName = col("db_object_symbol"),
      subjectCategories = Seq(Biolink.NamedThing),
      subjectProperties = Map("taxon" -> taxonProp),
      objectId = col("go_id"),
      objectCategories = Seq(Biolink.NamedThing),
      edges = Seq(EdgeRule(
        predicate = predicate,
        properties = Map(
          Biolink.KnowledgeLevel -> klat.foldLeft(lit(Biolink.NotProvided)) {
            case (acc, (code, (kl, _))) => when(col("evidence_code") === code, lit(kl)).otherwise(acc) },
          Biolink.AgentType -> klat.foldLeft(lit(Biolink.NotProvided)) {
            case (acc, (code, (_, at))) => when(col("evidence_code") === code, lit(at)).otherwise(acc) },
          Biolink.Publications -> when(size(publications) > 0, publications)))),
      primaryKnowledgeSource = provenance))
  }
}
