package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.scale.PrefixSum

/** Deterministic corpus sampling for training-data curation:
  * hash-based train/validation splits and global token-budget cuts.
  *
  * Both are content-addressed, not random: re-running the pipeline on
  * the same corpus (or on the same corpus plus new documents) yields the
  * same assignment per document — the property a 100 TB incremental
  * pipeline needs, and one `rand()` cannot give.
  */
object Sampling {

  /** First `digits` lowercase hex chars of md5(key) — THE content-
    * addressing convention every sampler here builds on, identical in
    * DuckDB (`substring(md5(CAST(k AS VARCHAR)), 1, digits)`), so the
    * SQL oracles mirror one expression. Hex is ordered, so comparing a
    * prefix against [[hexThreshold]] is a numeric bucket test. */
  def md5Prefix(key: Column, digits: Int): Column =
    substring(md5(key.cast("string").cast("binary")), 1, digits)

  /** First hex nibble of md5(key) — 16 equal-probability buckets. */
  def md5Nibble(key: Column): Column = md5Prefix(key, 1)

  /** Assign 'train' when the nibble falls in the first `trainSixteenths`
    * buckets (e.g. 13 → 13/16 ≈ 81% train), else 'val'. Pure
    * expression — scan-local, no shuffle, no driver state. */
  def hashSplit(key: Column, trainSixteenths: Int): Column = {
    require(trainSixteenths > 0 && trainSixteenths < 16,
      s"trainSixteenths must be in 1..15, got $trainSixteenths")
    when(md5Nibble(key) < lit(hexThreshold(trainSixteenths / 16.0, 1)),
      lit("train")).otherwise(lit("val"))
  }

  /** Lowercase hex threshold for a keep-fraction: a key survives when the
    * first `digits` hex chars of its md5 compare lexicographically below
    * this string (hex is ordered, so lexicographic = numeric). Fraction
    * granularity is 16^-digits. Fraction 1.0 maps to "g" — above every
    * hex prefix, keeps all. */
  def hexThreshold(fraction: Double, digits: Int = 4): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val buckets = 1L << (4 * digits)
    val t = math.floor(fraction * buckets).toLong
    if (t >= buckets) "g"
    else {
      val s = java.lang.Long.toHexString(t)
      ("0" * (digits - s.length)) + s
    }
  }

  /** Deterministic per-source mixture sampling: keep a document when its
    * md5 prefix falls under its source's fraction threshold — the
    * hash-threshold Bernoulli that hits target mixture proportions
    * WITHOUT a per-source row_number window (whose partition would be a
    * whole source: the skew cliff at 100 TB). Scan-local expression;
    * exact granularity 16^-digits; stable under re-runs and growth. */
  def mixtureKeep(key: Column, source: Column, fractions: Map[String, Double],
                  defaultFraction: Double = 1.0, digits: Int = 4): Column = {
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(hexThreshold(defaultFraction, digits))) {
      case (acc, (s, f)) =>
        when(source === lit(s), lit(hexThreshold(f, digits))).otherwise(acc)
    }
    md5Prefix(key, digits) < thr
  }

  /** Keep documents in `orderKey` order while the running sum of
    * `weightCol` stays within `budget` — the "first N billion tokens"
    * cut. Runs on the distributed two-level prefix sum
    * ([[graft.scale.PrefixSum]]), not a single-partition global window. */
  def budgetSample(df: DataFrame, orderKey: String, weightCol: String,
                   budget: Column, bucketSize: Long = 1 << 20): DataFrame =
    PrefixSum.withCumSum(df, orderKey, weightCol, "_cum_weight", bucketSize)
      .filter(col("_cum_weight") <= budget)
      .drop("_cum_weight")

  /** [[budgetSample]] with the budget as a FRACTION of the total weight
    * ("keep the first 60% of the corpus' tokens"). The scalar rides the
    * plan as a broadcast cross join — constructing the DataFrame runs no
    * driver action; the whole cut is one lazy plan. */
  def budgetSampleFraction(df: DataFrame, orderKey: String, weightCol: String,
                           fraction: Double,
                           bucketSize: Long = 1 << 20): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction $fraction")
    val budget = broadcast(df.agg(
      floor(lit(fraction) * sum(col(weightCol))).cast("long").as("_budget")))
    PrefixSum.withCumSum(df, orderKey, weightCol, "_cum_weight", bucketSize)
      .crossJoin(budget)
      .filter(col("_cum_weight") <= col("_budget"))
      .drop("_cum_weight", "_budget")
  }

  /** Greedy sequence packing: assign each document (in `orderKey` order)
    * to the fixed-size training bin where its FIRST token lands —
    * `bin = floor(exclusive_prefix / binTokens)`. Contiguous docs fill a
    * bin until one spills into the next; the packer never reorders
    * (padding/splitting policy is the trainer's concern). Adds `binCol`.
    * Runs on the distributed prefix sum — no global window. */
  def packBins(df: DataFrame, orderKey: String, weightCol: String,
               binCol: String, binTokens: Long,
               bucketSize: Long = 1 << 20): DataFrame =
    PrefixSum.withCumSum(df, orderKey, weightCol, "_cum_weight", bucketSize)
      .withColumn(binCol,
        floor((col("_cum_weight") - col(weightCol)) / lit(binTokens)).cast("long"))
      .drop("_cum_weight")
}
