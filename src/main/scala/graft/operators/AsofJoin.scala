package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (point-in-time join): for every left row, attach
  * the single most recent right row with the same key whose timestamp is
  * `<=` the left timestamp — the canonical "state of the world at event
  * time" lookup (kdb `aj`, pandas `merge_asof`, DuckDB `ASOF JOIN`).
  * Spark has no native operator for it; the naive SQL formulations are a
  * correlated subquery (re-planned per row) or an inequality theta-join
  * (a cartesian per key that collapses at scale).
  *
  * Implementation — the union-merge construction:
  *   1. tag both inputs and union them (right's payload columns are null
  *      on left rows and vice versa);
  *   2. one window partitioned by key, ordered by (ts, side) with right
  *      rows sorting BEFORE left rows on timestamp ties (inclusive `<=`
  *      semantics), computes `last(payload, ignoreNulls)` over the
  *      unbounded-preceding frame — i.e. each left row sees the payload
  *      of the nearest preceding right row;
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle + sort of |L|+|R| rows partitioned by key — the
  * same price as an equi-join, with no per-key blow-up. At 100 TB the
  * only hazard is a single hot key (its whole timeline lands in one
  * window partition); for that shape, pre-bucket the timeline: add a
  * coarse time-bucket to the partition key and replicate each bucket's
  * last right row into the next bucket (carry-forward), which bounds
  * every window partition by the bucket span.
  *
  * Right rows must be unique per (keys, ts) for a deterministic match;
  * ties among right rows are broken by the greatest `tieBreak` column.
  */
object AsofJoin {

  /** @param rightPayload right columns to carry onto matches (they are
    *                     exposed with their own names; they must not
    *                     collide with left column names)
    * @param tolerance    optional maximum left_ts - right_ts (micros);
    *                     matches further in the past are nulled out
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String],
               tieBreak: Option[String] = None,
               toleranceMicros: Option[Long] = None): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val leftCols = left.columns.toSeq

    val l = left.withColumn("_asof_ts", col(leftTs)).withColumn("_asof_side", lit(1))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as("_asof_ts")) ++
        rightPayload.map(col) ++ tieBreak.map(col).toSeq: _*)
      .withColumn("_asof_rts", col("_asof_ts"))
      .withColumn("_asof_side", lit(0))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val order = Seq(col("_asof_ts"), col("_asof_side")) ++ tieBreak.map(col).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = (rightPayload :+ "_asof_rts").foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    val withinTol = toleranceMicros match {
      case Some(tol) =>
        carried.withColumn("_asof_ok",
          col("_asof_rts").isNotNull &&
            (unix_micros(col("_asof_ts")) - unix_micros(col("_asof_rts"))) <= tol)
      case None => carried.withColumn("_asof_ok", col("_asof_rts").isNotNull)
      }

    val out = (rightPayload :+ "_asof_rts").foldLeft(withinTol) { (df, c) =>
      df.withColumn(c, when(col("_asof_ok"), col(c)))
    }
    out.filter(col("_asof_side") === 1)
      .select(leftCols.map(col) ++ rightPayload.map(col) :+
        col("_asof_rts").as("matched_ts"): _*)
  }
}
