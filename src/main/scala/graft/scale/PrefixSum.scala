package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed prefix (cumulative) sum over a totally-ordered numeric
  * key — the scale-safe replacement for the classic
  * `sum(x) OVER (ORDER BY k)` global window, which Spark executes in a
  * SINGLE partition (every row through one task: the textbook 100 TB
  * cliff).
  *
  * Two-level construction:
  *   1. bucket rows by `key / bucketSize` and aggregate per-bucket sums
  *      (map-side combine, one narrow shuffle on the bucket id);
  *   2. window over the bucket totals — #buckets rows, smaller than the
  *      input by `bucketSize`× — to get each bucket's exclusive offset;
  *   3. broadcast-join offsets back and run the within-bucket cumulative
  *      window PARTITIONED by bucket, so no window partition exceeds
  *      `bucketSize` rows.
  *
  * At 10^10 rows and bucketSize 10^6 the bucket-total window sees 10^4
  * rows — trivially single-partition-safe; recurse the same construction
  * if #buckets itself ever gets large.
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running sum of `valueCol` in `orderKey`
    * order. `orderKey` must be a non-negative integral column that is
    * unique per row (ties would make "running" ambiguous). */
  def withCumSum(df: DataFrame, orderKey: String, valueCol: String,
                 cumCol: String, bucketSize: Long = 1 << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = df.withColumn("_psum_bucket",
      floor(col(orderKey) / lit(bucketSize)).cast("long"))
    val totals = bucketed.groupBy(col("_psum_bucket"))
      .agg(sum(col(valueCol)).as("_psum_total"))
    val offsetWin = Window.orderBy(col("_psum_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = totals.select(col("_psum_bucket"),
      coalesce(sum(col("_psum_total")).over(offsetWin), lit(0L)).as("_psum_offset"))
    val withinWin = Window.partitionBy(col("_psum_bucket")).orderBy(col(orderKey))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), Seq("_psum_bucket"))
      .withColumn(cumCol,
        (col("_psum_offset") + sum(col(valueCol)).over(withinWin)).cast("long"))
      .drop("_psum_bucket", "_psum_offset")
  }
}
