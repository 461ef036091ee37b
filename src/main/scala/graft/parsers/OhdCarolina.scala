package graft.parsers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** OHD-Carolina (UNC open health data) parser.
  *
  * Reference (parsers/ohd_carolina/src/loadOHD.py:10-103): a zip-member
  * CSV of pre-scored clinical co-occurrence edges — per-row predicate
  * and primary knowledge source, chi-squared p-value / log-odds ratio
  * (with JSON CI array) / score / sample size props,
  * statistical_association + data_pipeline, named endpoint nodes. */
object OhdCarolina {

  val provenance = "infores:openhealthdata-carolina"

  def parse(spark: SparkSession, zipPath: String, member: String): ExtractedGraph = {
    val staging = java.nio.file.Files.createTempDirectory("graft-ohd-").toString
    val staged = Archives.extractMembers(zipPath, staging, _ == member)
    require(staged.nonEmpty, s"member $member not found in $zipPath")
    val raw = spark.read.option("header", "true").option("quote", "\"").csv(staged.head)
    val c = raw.columns

    val edges = raw.select(
      col(c(0)).as(Biolink.Subject),
      col(c(4)).as(Biolink.Predicate),
      col(c(2)).as(Biolink.Object_),
      col(c(10)).as(Biolink.PrimaryKnowledgeSource),
      col(c(8)).as("score"),
      col(c(5)).cast("double").as("p_value"),
      col(c(6)).cast("double").as("log_odds_ratio"),
      from_json(col(c(7)), org.apache.spark.sql.types.DataType.fromDDL("array<double>"))
        .as("log_odds_ratio_95_ci"),
      col(c(9)).cast("long").as("total_sample_size"),
      lit("statistical_association").as(Biolink.KnowledgeLevel),
      lit("data_pipeline").as(Biolink.AgentType))

    val nodes = raw.select(col(c(0)).as("id"), col(c(1)).as("name"))
      .unionByName(raw.select(col(c(2)).as("id"), col(c(3)).as("name")))
      .dropDuplicates("id")
      .select(col("id"), col("name"), array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
