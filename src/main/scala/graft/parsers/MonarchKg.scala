package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** Monarch KG edge passthrough parser — a KGX-native upstream.
  *
  * Reference (parsers/monarchkg/src/loadMonarchKG.py:9-226): the
  * monarch-kg jsonl tar.gz's edge file streams through with
  *  - rows missing subject/object/predicate dropped;
  *  - knowledge sources remapped (alliancegenome→agrkb, hgnc-ucl→hgnc,
  *    go-central→go) on both primary and aggregator lists;
  *  - the filtered variant keeps only the desired predicates, drops
  *    edges whose primary OR any aggregator source is on the ignore
  *    list, and drops endpoints with non-normalizable curie prefixes;
  *  - qualifiers dropped, all other non-empty attributes pass through;
  *  - endpoint nodes emitted bare (normalization enriches them).
  */
object MonarchKg {

  val provenance = "infores:monarchinitiative"

  val knowledgeSourceMapping: Map[String, String] = Map(
    "infores:alliancegenome" -> "infores:agrkb",
    "infores:hgnc-ucl" -> "infores:hgnc",
    "infores:go-central" -> "infores:go")

  val desiredPredicates: Set[String] = Set(
    "biolink:causes", "biolink:contributes_to",
    "biolink:has_phenotype", "biolink:expressed_in")

  val knowledgeSourceIgnoreList: Set[String] = Set(
    "infores:bgee", "infores:ctd", "infores:reactome", "infores:goa",
    "infores:cafa", "infores:bhf-ucl", "infores:aruk-ucl",
    "infores:parkinsonsuk-ucl", "infores:alzheimers-university-of-toronto",
    "infores:agbase", "infores:dictybase", "infores:ntnu-sb", "infores:wb")

  val nonNormalizablePrefixes: Set[String] = Set(
    "ZP", "phenopacket.store", "WB", "CLINVAR", "FYPO",
    "PomBase", "MMRRC", "WBPhenotype", "CAID", "XPO", "CUREID")

  private def remap(c: Column): Column =
    knowledgeSourceMapping.foldLeft(c) { case (acc, (from, to)) =>
      when(acc === from, lit(to)).otherwise(acc)
    }

  def parse(spark: SparkSession, tarPath: String,
            edgeMember: String = "monarch-kg_edges.jsonl",
            filtered: Boolean = true): ExtractedGraph = {
    val staging = java.nio.file.Files.createTempDirectory("graft-monarch-").toString
    val staged = Archives.extractMembers(tarPath, staging, _ == edgeMember)
    require(staged.nonEmpty, s"member $edgeMember not found in $tarPath")
    val raw = spark.read.json(staged.head)

    val base0 = raw
      .filter(col(Biolink.Subject).isNotNull && col(Biolink.Subject) =!= "" &&
        col(Biolink.Object_).isNotNull && col(Biolink.Object_) =!= "" &&
        col(Biolink.Predicate).isNotNull && col(Biolink.Predicate) =!= "")
      .withColumn(Biolink.PrimaryKnowledgeSource, remap(col(Biolink.PrimaryKnowledgeSource)))
      .withColumn(Biolink.AggregatorKnowledgeSources,
        if (raw.columns.contains(Biolink.AggregatorKnowledgeSources))
          transform(coalesce(col(Biolink.AggregatorKnowledgeSources),
            array().cast("array<string>")), ks => remap(ks))
        else array().cast("array<string>"))

    val base =
      if (!filtered) base0
      else base0
        .filter(col(Biolink.Predicate).isin(desiredPredicates.toSeq: _*))
        .filter(!col(Biolink.PrimaryKnowledgeSource).isin(knowledgeSourceIgnoreList.toSeq: _*))
        .filter(!exists(col(Biolink.AggregatorKnowledgeSources),
          ks => ks.isin(knowledgeSourceIgnoreList.toSeq: _*)))
        .filter(!regexp_extract(col(Biolink.Subject), "^([^:]+):", 1)
          .isin(nonNormalizablePrefixes.toSeq: _*))
        .filter(!regexp_extract(col(Biolink.Object_), "^([^:]+):", 1)
          .isin(nonNormalizablePrefixes.toSeq: _*))

    val edges = base.drop("qualifiers")
    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
