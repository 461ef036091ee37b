package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Biolink

/** The parser-plane extractor DSL (SURVEY §2.3 P1-P5).
  *
  * The reference's `csv_extract`/`parse_row` (orion/extractor.py:26-190)
  * applies per-row lambdas for subject/object/predicate/properties with
  * multi-predicate fan-out and id-set filters. Here an extraction is a
  * declarative bundle of Column expressions applied to a source DataFrame —
  * Catalyst sees every projection/filter, so pushdown and pruning reach the
  * scan for free (the reference does both by hand).
  */
object Extractor {

  /** One emitted edge per rule (multi-predicate fan-out, extractor.py:113-147). */
  final case class EdgeRule(
      predicate: Column,
      properties: Map[String, Column] = Map.empty,
      rowFilter: Column = lit(true))

  final case class Extraction(
      subjectId: Column,
      objectId: Column,
      edges: Seq[EdgeRule],
      subjectName: Column = lit(null).cast("string"),
      subjectCategories: Seq[String] = Seq(Biolink.NamedThing),
      subjectProperties: Map[String, Column] = Map.empty,
      objectName: Column = lit(null).cast("string"),
      objectCategories: Seq[String] = Seq(Biolink.NamedThing),
      objectProperties: Map[String, Column] = Map.empty,
      primaryKnowledgeSource: String = "infores:unknown",
      rowFilter: Column = lit(true))

  final case class ExtractedGraph(nodes: DataFrame, edges: DataFrame)

  /** S3-style delimited scan: headers, comments, tabs
    * (ref orion/extractor.py:26-66 csv_extract). */
  def readDelimited(spark: SparkSession, path: String, sep: String = "\t",
                    header: Boolean = true, comment: String = "#"): DataFrame =
    spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("comment", comment)
      .option("inferSchema", "true")
      .csv(path)

  /** Run an extraction: rows lacking subject/object are skipped
    * (extractor.py:154-160); each EdgeRule fans out one edge per row. */
  def extract(source: DataFrame, x: Extraction): ExtractedGraph = {
    val base = source
      .filter(x.rowFilter)
      .filter(x.subjectId.isNotNull && x.objectId.isNotNull)

    def nodeDf(id: Column, name: Column, cats: Seq[String], props: Map[String, Column]) = {
      val cols = Seq(id.as("id"), name.as("name"),
        array(cats.map(lit): _*).as("category")) ++
        props.map { case (k, v) => v.as(k) }
      base.select(cols: _*).filter(col("id").isNotNull).dropDuplicates("id")
    }

    val subjects = nodeDf(x.subjectId, x.subjectName, x.subjectCategories, x.subjectProperties)
    val objects = nodeDf(x.objectId, x.objectName, x.objectCategories, x.objectProperties)
    val nodes = subjects.unionByName(objects, allowMissingColumns = true)
      .dropDuplicates("id")

    // multi-predicate fan-out as an explode over per-rule structs; each rule
    // may carry different property columns → union the property namespace
    val allEdgeProps = x.edges.flatMap(_.properties.keys).distinct
    val edgeStructs = x.edges.map { r =>
      val propCols = allEdgeProps.map(p =>
        r.properties.getOrElse(p, lit(null)).as(p))
      val payload = struct(Seq(r.predicate.cast("string").as("predicate"),
        when(r.rowFilter, lit(true)).otherwise(lit(false)).as("_keep")) ++ propCols: _*)
      payload
    }
    val edges = base
      .select(x.subjectId.as(Biolink.Subject), x.objectId.as(Biolink.Object_),
        explode(array(edgeStructs: _*)).as("_e"))
      .filter(col("_e._keep") && col("_e.predicate").isNotNull)
      .select(Seq(col(Biolink.Subject), col(Biolink.Object_),
        col("_e.predicate").as(Biolink.Predicate),
        lit(x.primaryKnowledgeSource).as(Biolink.PrimaryKnowledgeSource)) ++
        allEdgeProps.map(p => col(s"_e.$p").as(p)): _*)

    ExtractedGraph(nodes, edges)
  }

  /** P3 — id-set membership filter (broadcast isin for small sets, semi-join
    * for large; ref orion/extractor.py:51-54). */
  def filterBySet(df: DataFrame, column: Column, allowed: Set[String]): DataFrame =
    if (allowed.size <= 10000) df.filter(column.isin(allowed.toSeq: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(allowed.toSeq.toDF("_allowed"), column === col("_allowed"), "left_semi")
    }
}
