package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: pair left rows with right rows sharing a key
  * whose timestamp falls in the half-open window
  * `(left_ts - spanMicros, left_ts]` — "events in the preceding N
  * minutes". The naive plan for `l.key = r.key AND r.ts BETWEEN …` is an
  * equi-join on key followed by a per-key filter, which degenerates to a
  * per-key cartesian when keys have long timelines (Spark cannot
  * interval-partition an inequality predicate on its own).
  *
  * Construction: both sides are bucketed by `floor(ts / spanMicros)`;
  * a right row in bucket b can only match left rows in buckets b or
  * b+1, so the left side is EXPLODED to its two candidate buckets and
  * the join becomes a plain equi-join on (key, bucket) — hash-shuffled,
  * AQE-planned, no theta-join — followed by the exact range filter.
  * Candidate blow-up is exactly 2× the left side, independent of key
  * skew or data volume; the same construction covers any constant-width
  * window (for (lower, upper] windows, shift buckets by `lower`).
  */
object RangeJoin {

  /** Matched pairs: all left columns plus `rightPayload` columns from the
    * right rows within the window. Inner semantics (unmatched left rows
    * absent) — wrap with a left join on the output for outer counts. */
  def pairsPreceding(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, spanMicros: Long,
                     rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_rj_lts", unix_micros(col(leftTs)))
      .withColumn("_rj_bucket",
        explode(array(floor(col("_rj_lts") / spanMicros),
          floor(col("_rj_lts") / spanMicros) - 1)))
    val r = right
      .select(keys.map(col) ++ (col(rightTs) :: rightPayload.map(col).toList): _*)
      .withColumn("_rj_rts", unix_micros(col(rightTs)))
      .withColumn("_rj_bucket", floor(col("_rj_rts") / spanMicros))
      .drop(rightTs)
    l.join(r, keys :+ "_rj_bucket")
      .filter(col("_rj_rts") > col("_rj_lts") - spanMicros &&
        col("_rj_rts") <= col("_rj_lts"))
      .select(leftCols.map(col) ++ rightPayload.map(col) :+
        timestamp_micros(col("_rj_rts")).as("matched_ts"): _*)
  }
}
