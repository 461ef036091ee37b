package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** CAM-KP (causal activity models) parser.
  *
  * Reference (parsers/camkp/src/loadCAMKP.py:17-151): headerless gz TSV
  * (subject, predicate, object, provenance url, provenance id,
  * qualifiers):
  *  - node ids strip surrounding quotes and a doubled `MGI:` prefix;
  *  - the per-row provenance id is the primary knowledge source, CAM-KP
  *    itself the aggregator, the provenance url an xref;
  *  - qualifiers arrive as `(biolink:key=value)&&(...)`; only
  *    anatomical_context_qualifier is supported (anything else is a hard
  *    failure) and each qualifier fans out its own edge copy. */
object CamKp {

  val aggregator = "infores:cam-kp"

  private def sanitize(c: Column): Column = {
    val unquoted = regexp_replace(c, "^\"|\"$", "")
    when(unquoted.startsWith("MGI:"), unquoted.substr(lit(5), lit(4096))).otherwise(unquoted)
  }

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = spark.read.option("sep", "\t").option("header", "false").csv(path)
    val c = raw.columns

    val qualifiers = if (c.length > 5)
      transform(split(coalesce(col(c(5)), lit("")), "&&"),
        q => regexp_replace(q, "^\\(|\\)$", ""))
    else array(lit(""))

    val exploded = raw.select(
        sanitize(col(c(0))).as(Biolink.Subject),
        col(c(1)).as(Biolink.Predicate),
        sanitize(col(c(2))).as(Biolink.Object_),
        col(c(4)).as("pks"), col(c(3)).as("url"),
        explode(qualifiers).as("q"))
      .withColumn("q_key", regexp_replace(element_at(split(col("q"), "="), 1), "^biolink:", ""))
      .withColumn("q_value", when(size(split(col("q"), "=")) > 1, element_at(split(col("q"), "="), 2)))

    val unsupported = exploded
      .filter(col("q") =!= "" && col("q_key") =!= "anatomical_context_qualifier").count()
    require(unsupported == 0, s"$unsupported unsupported qualifiers in CAM-KP input")

    val edges = exploded.select(
      col(Biolink.Subject), col(Biolink.Predicate), col(Biolink.Object_),
      col("pks").as(Biolink.PrimaryKnowledgeSource),
      array(lit(aggregator)).as(Biolink.AggregatorKnowledgeSources),
      array(col("url")).as("xref"),
      when(col("q_key") === "anatomical_context_qualifier", col("q_value"))
        .as("anatomical_context_qualifier"),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
