package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8-adjacent — N-Quads / N-Triples line scan.
  *
  * The reference streams ubergraph.nq.gz through pyoxigraph
  * (parsers/MONDOProperties/src/loadMP.py:60-80); here each line parses
  * with one regexp in a distributed scan (gz transparent). Covers the
  * triple shapes the ontology pipelines use: IRI objects and (optionally
  * typed/tagged) literal objects; malformed lines drop out as nulls.
  */
object NQuads {

  // <s> <p> <o> [<g>] .   |   <s> <p> "literal"[^^<t>|@lang] [<g>] .
  private val lineRegex =
    """^\s*<([^>]+)>\s+<([^>]+)>\s+(?:<([^>]+)>|"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]+>|@[A-Za-z-]+)?)\s*(?:<[^>]+>\s*)?\.\s*$"""

  /** (subject, predicate, object_iri, object_literal) — exactly one of the
    * object columns is non-null per parsed row. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        regexp_extract(col("value"), lineRegex, 1).as("subject"),
        regexp_extract(col("value"), lineRegex, 2).as("predicate"),
        regexp_extract(col("value"), lineRegex, 3).as("object_iri"),
        regexp_extract(col("value"), lineRegex, 4).as("object_literal"))
      .filter(col("subject") =!= "")
      .select(col("subject"), col("predicate"),
        when(col("object_iri") =!= "", col("object_iri")).as("object_iri"),
        when(col("object_iri") === "", col("object_literal")).as("object_literal"))
}
