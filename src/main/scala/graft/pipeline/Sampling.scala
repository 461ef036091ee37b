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

  /** Temperature-scaled mixture quotas (the multilingual-LLM sampling
    * rule — mT5/XLM-R style p_s ∝ c_s^α at α = 1/2): per-source document
    * quotas proportional to √count, flattening the source distribution so
    * head sources stop drowning the tail. Every step is ENGINE-EXACT so
    * the DuckDB oracle reproduces it bit for bit: weight = ⌊√c⌋ (IEEE
    * sqrt is correctly rounded, so the floor is exact), quota and the
    * keep-threshold use integer `div`, and the kept set is the same
    * hash-threshold Bernoulli as [[mixtureKeep]] — scan-local, no
    * per-source row_number window (the skew cliff at 100 TB).
    *
    * Returns one audit row per source: (source, n_docs, weight, quota,
    * threshold_hex, n_kept). `n_kept` tracks quota only in expectation
    * (hash-threshold sampling trades exact counts for scan-locality and
    * growth-stability — the same trade mixtureKeep makes). */
  def temperatureQuotas(docs: DataFrame, idCol: String, sourceCol: String,
                        totalTarget: Long, digits: Int = 4): DataFrame = {
    val perSource = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
    val total = broadcast(perSource.agg(sum(col("weight")).as("_w_total")))
    val buckets = 1L << (4 * digits)
    val quotas = perSource.crossJoin(total)
      .withColumn("quota", expr(s"($totalTarget * weight) div _w_total"))
      .withColumn("threshold_hex",
        when(col("quota") >= col("n_docs"), lit("g"))
          .otherwise(lpad(lower(conv(
            expr(s"($buckets * quota) div n_docs"), 10, 16)), digits, "0")))
      .drop("_w_total")
    val kept = docs
      .select(md5Prefix(col(idCol), digits).as("_h"), col(sourceCol).as("_src"))
      .join(broadcast(quotas), col("_src") === col("source"))
      .filter(col("_h") < col("threshold_hex"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    quotas.join(kept, Seq("source"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
  }

  /** Deterministic global shuffle + sharding — the last stage of a
    * training-data pipeline, where the curated corpus becomes N training
    * shards in a reproducible pseudo-random order. shard = md5 bucket of
    * the key (content-addressed: re-runs and incremental appends keep
    * every existing document's shard); within-shard order = full-md5
    * rank. The per-shard sort IS the physical write pattern
    * (`repartition(shard).sortWithinPartitions` — each shard sorts in
    * parallel; no global order, no single-partition window). Adds
    * `shardCol` and `seqCol`. */
  def shuffleShard(df: DataFrame, key: Column, nShards: Int,
                   shardCol: String = "shard", seqCol: String = "seq"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val sharded = df.withColumn(shardCol,
      (conv(md5Prefix(key, 8), 16, 10).cast("long") % nShards).cast("int"))
    val w = Window.partitionBy(col(shardCol))
      .orderBy(md5(key.cast("string").cast("binary")), key)
    sharded.withColumn(seqCol, row_number().over(w).cast("long"))
  }

  /** Equal-allocation stratified sampling: the `n` hash-smallest rows of
    * every stratum — a deterministic "n examples per class" selector
    * (eval-set construction, per-domain probes) that no single stratum
    * can dominate. Order inside a stratum is (md5(key), key): content-
    * addressed, so re-runs and corpus growth keep earlier picks stable
    * until displaced by hash order. Adds `rankCol`.
    *
    * Scale shape: one hash-partitioned window per stratum with a rank
    * filter Spark rewrites to WindowGroupLimit (partial top-n BEFORE the
    * shuffle), so a billion-row stratum ships only n·partitions rows —
    * not the stratum — to the window sort. */
  def stratifiedTopN(df: DataFrame, strata: Column, key: Column, n: Int,
                     rankCol: String = "strat_rank"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strata).orderBy(md5Prefix(key, 8).asc, key.asc)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= n)
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

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis 2006): each row draws a content-addressed
    * uniform u = (hash60(key)+1)/(2^60+1) and is ranked by
    * -ln(u) / weight; the k SMALLEST ranks are a weighted sample without
    * replacement. Content-addressing replaces the usual rand(): the same
    * corpus always yields the same sample (and the same row keeps the
    * same draw when new rows arrive — only boundary rows change).
    *
    * The rank is rounded to 9 decimals and tie-broken on `key` so an
    * independent engine evaluating the same formula selects the
    * identical set (raw libm `ln` can differ in the last ulp across
    * runtimes).
    *
    * Scale: global top-k plans as TakeOrderedAndProject — per-partition
    * heap of k, driver merge of k × partitions rows; no global sort. */
  def weightedTopK(df: DataFrame, key: Column, weightCol: String,
                   k: Int, rankCol: String = "es_rank"): DataFrame = {
    // u on (0,1]: (h+1)/2^60 — both the numerator and the power-of-two
    // denominator are exact in double, so u is bit-identical cross-engine
    val u = (graft.sketch.Kmv.hash60(key).cast("double") + 1.0) /
      graft.sketch.Kmv.HashSpaceSize
    df.withColumn(rankCol, round(-log(u) / col(weightCol), 9))
      .orderBy(col(rankCol), key)
      .limit(k)
  }
}
