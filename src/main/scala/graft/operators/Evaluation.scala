package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.StableRound

/** Classifier/distribution evaluation statistics, computed in EXACT
  * integer arithmetic so they hash-pin across engines:
  *
  *  - ROC AUC via the tie-corrected rank-sum (Mann-Whitney U) identity:
  *    AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), with average ranks for
  *    ties. Doubled ranks (2·rank is always integral, ties included)
  *    keep every intermediate a long; only the final ratio divides.
  *  - Two-sample Kolmogorov-Smirnov via cross-multiplied ECDFs:
  *    sup |F_a − F_b| = max |cum_a·n_b − cum_b·n_a| / (n_a·n_b) — the
  *    numerator is exact, the sup is over integers.
  *
  * Scale shape: both first collapse the input to per-(group, value)
  * COUNTS — one map-combined groupBy — and only then run a cumulative
  * window over the distinct values of each group. The window input is
  * the aggregated value-histogram, orders of magnitude smaller than the
  * raw data; for a score column with unbounded distinct cardinality,
  * quantize first (the callers here use integer scores/buckets) — the
  * histogram, not the corpus, is what a single partition must hold.
  */
object Evaluation {

  /** Per-group tie-corrected ROC AUC of integer `scoreCol` against
    * boolean `labelCol`. Output: (group, n_pos, n_neg, auc). */
  def rocAuc(df: DataFrame, groupCol: String, scoreCol: String,
             labelCol: String): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(scoreCol).as("s"))
      .agg(count(lit(1)).as("cnt"),
           sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist.withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      // doubled average rank of a tie group: 2·cum_before + cnt + 1
      .withColumn("rank2", lit(2L) * col("cum_before") + col("cnt") + lit(1L))
    ranked.groupBy(col(groupCol))
      .agg(sum(col("pos")).as("n_pos"),
           (sum(col("cnt")) - sum(col("pos"))).as("n_neg"),
           sum(col("pos") * col("rank2")).as("sum_rank2"))
      .select(col(groupCol), col("n_pos"), col("n_neg"),
        StableRound.tieStableRound(
          (col("sum_rank2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"))
  }

  /** Per-group two-sample KS statistic between slices 'a'/'b' of
    * `sliceCol`, over integer `valueCol` (quantize upstream if the value
    * is continuous). Output: (group, n_a, n_b, ks). */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
             sliceCol: String): DataFrame = {
    val hist = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(sum(when(col(sliceCol) === "a", 1L).otherwise(0L)).as("ca"),
           sum(when(col(sliceCol) === "b", 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
    val tot = Window.partitionBy(col(groupCol))
    cum
      .withColumn("n_a", sum(col("ca")).over(tot))
      .withColumn("n_b", sum(col("cb")).over(tot))
      .groupBy(col(groupCol), col("n_a"), col("n_b"))
      .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))).as("ks_num"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        StableRound.tieStableRound(
          col("ks_num").cast("double") / (col("n_a") * col("n_b")).cast("double"), 6).as("ks"))
  }

  /** Binary classification confusion metrics at a fixed decision rule:
    * exact integer confusion counts in ONE map-combined aggregation,
    * then precision / recall / F1 / accuracy as ratios of those exact
    * integers (F1 via its 2tp/(2tp+fp+fn) identity rather than composing
    * the two already-divided ratios — one division, no compounding).
    * Degenerate denominators (no predicted / no actual positives) yield
    * null rather than a fabricated 0. */
  def binaryMetrics(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val counts = df.agg(
      count(when(actual && predicted, 1)).as("tp"),
      count(when(!actual && predicted, 1)).as("fp"),
      count(when(actual && !predicted, 1)).as("fn"),
      count(when(!actual && !predicted, 1)).as("tn"))
    def ratio(num: Column, den: Column): Column =
      StableRound.tieStableRound(
        num.cast("double") / when(den === 0, null).otherwise(den).cast("double"), 6)
    counts.select(col("tp"), col("fp"), col("fn"), col("tn"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"),
      ratio(col("tp") * 2, col("tp") * 2 + col("fp") + col("fn")).as("f1"),
      ratio(col("tp") + col("tn"),
        col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"))
  }
}
