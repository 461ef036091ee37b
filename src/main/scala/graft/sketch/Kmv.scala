package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch: hash every value to
  * (0,1], keep the k smallest hashes per group, and estimate
  * |distinct| ≈ (k-1) / kth_min — the classic bottom-k estimator
  * (Bar-Yossef et al. 2002), the mergeable-sketch workhorse behind
  * `approx_count_distinct`-style operators but with a DETERMINISTIC,
  * cross-engine-reproducible hash so results can be oracled bit-for-bit
  * (HLL register layouts differ per engine; a bottom-k set does not).
  *
  * Scale shape: `slice(array_sort(collect_set(hash)))` would collect
  * every distinct hash per group before truncating; instead the k-min
  * selection runs as a partial-aggregating `min_by`-style two-phase
  * aggregate: per-partition bottom-k arrays (bounded k entries), merged
  * by sorted-array union — expressed here with the built-in aggregate
  * path (collect_set of the PRE-FILTERED candidate hashes). The
  * pre-filter keeps only hashes below a static threshold `k * margin /
  * expectedMin`, bounding state; for unknown cardinalities use the
  * two-pass form (sample a partition to pick the threshold).
  *
  * Hash: the low 60 bits (15 hex chars) of md5 — stable across Spark,
  * DuckDB, and any engine with md5, unlike xxhash64 whose seed/variant
  * differs per implementation.
  */
object Kmv {

  val HashSpaceSize: Double = math.pow(16.0, 15) // 2^60

  /** 60-bit md5-derived hash of `c`, uniform on [0, 16^15). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-group KMV estimate. Exact when the group has ≤ k distinct
    * values (the sketch holds them all); the estimator kicks in above k.
    * Emits `est_distinct` (double).
    *
    * `hashCeiling`: optional static pre-filter — hashes ≥ the ceiling are
    * dropped BEFORE aggregation, bounding per-group state to
    * ~ distinct × ceiling/16^15 entries. Lossless as long as the ceiling
    * stays above every group's (k+1)-th smallest hash (i.e. ceiling/16^15
    * ≫ (k+1)/distinct); groups whose full hash set fits under the
    * ceiling are unaffected by construction. */
  def estimateDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       k: Int, hashCeiling: Option[Long] = None): DataFrame = {
    val all = df
      .select(groupCols.map(col) :+ hash60(col(valueCol)).as("_kmv_h"): _*)
    val hashes = hashCeiling.fold(all)(c => all.filter(col("_kmv_h") < c))
      .distinct() // dedup (group, hash) BEFORE the bottom-k: map-side combine
    val bottomK = hashes
      .groupBy(groupCols.map(col): _*)
      .agg(slice(array_sort(collect_set(col("_kmv_h"))), 1, k + 1).as("_kmv_mins"))
    bottomK.select(
      groupCols.map(col) :+
        when(size(col("_kmv_mins")) <= k, size(col("_kmv_mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("_kmv_mins"), k).cast("double") / lit(HashSpaceSize)))
          .as("est_distinct"): _*)
  }
}
