package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) with an
  * engine-reproducible hash family: d independent md5-derived hash rows
  * of w buckets each; a key's count estimate is the MINIMUM of its d
  * bucket counters — always ≥ the true count, within εN with probability
  * 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Scale shape: the sketch is a d×w counter grid — built by exploding
  * each row to its d (row, bucket) cells and hash-aggregating, so the
  * partial aggregation happens map-side and the shuffled state is AT
  * MOST d×w cells per partition regardless of input size (the whole
  * point of a sketch: 4×1024 cells summarize any number of rows).
  * Estimation joins candidate keys against the (broadcastable) grid.
  * The hash family is the same 60-bit md5 construction as [[Kmv]]
  * (row index salted into the input), so an independent engine can
  * rebuild the identical grid — which is how the oracle checks it.
  */
object CountMin {

  /** The d×w counter grid: (row, bucket, cnt). */
  def sketch(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame =
    df.select(explode(sequence(lit(0), lit(d - 1))).as("_cms_row"), col(keyCol))
      .select(col("_cms_row"),
        (Kmv.hash60(concat(col("_cms_row"), lit(":"), col(keyCol).cast("string")))
          % w).as("_cms_bucket"))
      .groupBy(col("_cms_row"), col("_cms_bucket"))
      .agg(count(lit(1)).as("_cms_cnt"))

  /** Point estimates for every distinct key in `df`: min over the d rows
    * of the key's bucket counter. Emits (keyCol, est). The grid side is
    * broadcast — d×w cells. */
  def estimateCounts(df: DataFrame, keyCol: String, d: Int, w: Int): DataFrame = {
    val grid = sketch(df, keyCol, d, w)
    val candidates = df.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0), lit(d - 1))).as("_cms_row"))
      .select(col(keyCol), col("_cms_row"),
        (Kmv.hash60(concat(col("_cms_row"), lit(":"), col(keyCol).cast("string")))
          % w).as("_cms_bucket"))
    candidates
      .join(broadcast(grid), Seq("_cms_row", "_cms_bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("_cms_cnt")).as("est"))
  }
}
