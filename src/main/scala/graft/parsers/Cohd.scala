package graft.parsers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** COHD (clinical co-occurrence) parser — KGX jsonl passthrough with
  * TRAPI retrieval-source flattening.
  *
  * Reference (parsers/cohd/src/loadCOHD.py:6-75): nodes pass through;
  * each edge's `sources` array flattens into one column per
  * resource_role (primary_knowledge_source etc.), then drops. */
object Cohd {

  val provenance = "infores:cohd"

  def parse(spark: SparkSession, dir: String): ExtractedGraph = {
    val nodes = spark.read.json(s"$dir/cohd_nodes.jsonl")
    val edges0 = spark.read.json(s"$dir/cohd_edges.jsonl")
    // distinct resource roles: bounded by the biolink retrieval-source
    // vocabulary (single digits) — small, closed on the driver like the
    // reference's per-role column fan-out
    val roles = edges0.select(explode(col("sources")).as("s"))
      .select(col("s.resource_role")).distinct().collect().map(_.getString(0))
    val flattened = roles.foldLeft(edges0) { (df, role) =>
      df.withColumn(role,
        try_element_at(filter(col("sources"), s => s.getField("resource_role") === role), lit(1))
          .getField("resource_id"))
    }.drop("sources")
    ExtractedGraph(nodes, flattened)
  }
}
