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

    // multi-predicate fan-out: when every rule carries the same property
    // keys the fan-out is a single-scan explode over per-rule structs;
    // heterogeneous property sets would need type-unified null literals
    // (not inferable pre-analysis), so those fall back to a per-rule
    // unionByName — one scan per rule, columns pruned per rule.
    val propKeySets = x.edges.map(_.properties.keySet).distinct
    val edges = if (propKeySets.size <= 1) {
      val props = x.edges.headOption.map(_.properties.keys.toSeq).getOrElse(Nil)
      val edgeStructs = x.edges.map { r =>
        struct(Seq(r.predicate.cast("string").as("predicate"),
          when(r.rowFilter, lit(true)).otherwise(lit(false)).as("_keep")) ++
          props.map(p => r.properties(p).as(p)): _*)
      }
      base
        .select(x.subjectId.as(Biolink.Subject), x.objectId.as(Biolink.Object_),
          explode(array(edgeStructs: _*)).as("_e"))
        .filter(col("_e._keep") && col("_e.predicate").isNotNull)
        .select(Seq(col(Biolink.Subject), col(Biolink.Object_),
          col("_e.predicate").as(Biolink.Predicate),
          lit(x.primaryKnowledgeSource).as(Biolink.PrimaryKnowledgeSource)) ++
          props.map(p => col(s"_e.$p").as(p)): _*)
    } else {
      x.edges.map { r =>
        base.filter(r.rowFilter)
          .select(Seq(
            x.subjectId.as(Biolink.Subject), x.objectId.as(Biolink.Object_),
            r.predicate.cast("string").as(Biolink.Predicate),
            lit(x.primaryKnowledgeSource).as(Biolink.PrimaryKnowledgeSource)) ++
            r.properties.map { case (k, v) => v.as(k) }: _*)
          .filter(col(Biolink.Predicate).isNotNull)
      }.reduce(_.unionByName(_, allowMissingColumns = true))
    }

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
