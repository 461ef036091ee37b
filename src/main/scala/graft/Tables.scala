package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic star schema (TESTDATA.md).
  * All queries take an `sfDir` and read only through here so the scan
  * options stay consistent (Parquet → predicate pushdown + column pruning
  * for free).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `ts` has shipped as TIMESTAMP(NANOS) (readable only as a long via
    * spark.sql.legacy.parquet.nanosAsLong, set in Sessions.base), and as
    * plain TIMESTAMP(MICROS) without the UTC flag (read as TIMESTAMP_NTZ).
    * Normalize every variant to a microsecond TimestampType column: the
    * streaming plane (watermarks, unix_micros) and the typed
    * Dataset[Event] encoder both require TIMESTAMP. Sessions run with
    * spark.sql.session.timeZone=UTC, so the NTZ→TZ cast preserves the
    * stored microsecond values bit-for-bit. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      // integer division: `/` on longs is double division in Spark and loses
      // the low bits of an epoch-nanos value (2^61 > 2^53) — off-by-1µs
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
