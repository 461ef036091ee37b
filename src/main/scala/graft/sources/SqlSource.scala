package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.extract.Extractor
import graft.extract.Extractor.{ExtractedGraph, Extraction}

/** S4 — SQL/JDBC scan feeding the extractor plane.
  *
  * Reference: `sql_extract` runs a query through a DB-API cursor and feeds
  * rows to the per-row extractor (orion/extractor.py:68-82); connections
  * come from MySQL/PostgreSQL connectors (orion/db_connectors.py:1-97).
  *
  * Spark-first: `spark.read.jdbc` IS the cursor — the query is pushed to
  * the database as a subquery (dbtable = "(query) alias"), and for large
  * tables `partitionColumn`/`numPartitions` fan the read out across
  * executors (each executor opens its own connection — the scale path the
  * single-cursor reference lacks). The extraction itself is the same
  * declarative bundle used by every file source.
  */
object SqlSource {

  /** Read `query` over JDBC as a DataFrame (one connection). */
  def readQuery(spark: SparkSession, url: String, query: String,
                properties: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, s"($query) graft_sql_src", properties)

  /** Partitioned read for large result sets: ranges of `partitionColumn`
    * split across `numPartitions` parallel connections. */
  def readQueryPartitioned(spark: SparkSession, url: String, query: String,
                           partitionColumn: String, lowerBound: Long, upperBound: Long,
                           numPartitions: Int,
                           properties: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, s"($query) graft_sql_src", partitionColumn,
      lowerBound, upperBound, numPartitions, properties)

  /** sql_extract — JDBC query → extraction bundle → KGX nodes/edges. */
  def sqlExtract(spark: SparkSession, url: String, query: String,
                 extraction: Extraction,
                 properties: java.util.Properties = new java.util.Properties()): ExtractedGraph =
    Extractor.extract(readQuery(spark, url, query, properties), extraction)
}
