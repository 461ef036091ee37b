package graft.parsers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Extractor
import graft.extract.Extractor.{EdgeRule, ExtractedGraph, Extraction}
import graft.model.Biolink

/** Genome Alliance ortholog parser.
  *
  * Reference (parsers/GenomeAlliance/src/loadGenomeAlliance.py:12-89):
  * gzipped TSV with '#' comments + header; gene1 (col 0) orthologous_to
  * gene2 (col 4), ids cleaned of '_'; provenance infores:agrkb. */
object GenomeAlliance {

  val provenance = "infores:agrkb"

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = Extractor.readDelimited(spark, path, sep = "\t", header = true, comment = "#")
    val cols = raw.columns
    val base = raw.select(
      regexp_replace(col(cols(0)), "_", "").as("gene1_id"),
      col(cols(1)).as("gene1_label"),
      regexp_replace(col(cols(4)), "_", "").as("gene2_id"),
      col(cols(5)).as("gene2_label"))
    Extractor.extract(base, Extraction(
      subjectId = col("gene1_id"),
      subjectName = col("gene1_label"),
      subjectCategories = Seq("biolink:Gene"),
      objectId = col("gene2_id"),
      objectName = col("gene2_label"),
      objectCategories = Seq("biolink:Gene"),
      edges = Seq(EdgeRule(predicate = lit("biolink:orthologous_to"))),
      primaryKnowledgeSource = provenance))
  }
}
