package graft.sketch

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) with a
  * DETERMINISTIC, cross-engine-reproducible register construction —
  * unlike `approx_count_distinct`, whose xxhash/dense-sparse register
  * encoding is engine-private, these registers rebuild bit-for-bit in
  * any engine with md5, so the ESTIMATE itself is oracle-checkable
  * (same contract as the KMV and count-min sketches here).
  *
  * Layout: p = 6 → m = 64 registers. The 60-bit md5 hash splits into a
  * 6-bit register index (top bits) and a 54-bit suffix w; the register
  * value is the position of w's leading 1 bit: rank = 55 − bitlen(w)
  * (55 when w = 0). bitlen comes from `length(bin(w))` — string-exact
  * integer math, no float log2 edge cases.
  *
  * Determinism trick for the harmonic mean: Σ 2^−Mj is accumulated in
  * integer units of 2^−55 (every term 2^(55−Mj) is an exact BIGINT; the
  * total stays under 64·2^54 < 2^60), so the sum is order-free and the
  * final α·m²·2^55 / S divide is one IEEE op both engines share.
  *
  * Scale shape: distinct (group, hash) → groupBy (group, idx) max —
  * two map-combined aggregations; per-group state is 64 longs. This is
  * the mergeable-sketch shape: unioning register tables with max() IS
  * the sketch merge, so shards/streams combine without re-scanning. */
object Hll {

  val P = 6
  val M = 1 << P                       // 64 registers
  val SuffixBits = 60 - P              // 54
  val SuffixMask = (1L << SuffixBits) - 1
  val Unit = 1L << (SuffixBits + 1)    // 2^55: the integer 2^-0 unit
  val Alpha = 0.709                    // α₆₄ (Flajolet et al., m = 64)

  /** Per-group HLL estimate of |distinct valueCol| plus the exact count
    * for comparison. Emits (groupCols..., hll_est rounded 6, exact). */
  def estimateDistinct(df: DataFrame, groupCols: Seq[String],
                       valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val hashed = df
      .select(g :+ Kmv.hash60(col(valueCol)).as("hv"): _*)
      .distinct()
    val ranks = hashed.select(
      g :+ shiftright(col("hv"), SuffixBits).as("idx") :+
        when(col("hv").bitwiseAND(lit(SuffixMask)) === 0L, lit(55))
          .otherwise(lit(55) -
            length(bin(col("hv").bitwiseAND(lit(SuffixMask))))).as("rank"): _*)
    val regs = ranks.groupBy(g :+ col("idx"): _*).agg(max(col("rank")).as("mj"))
    val agg = regs.groupBy(g: _*).agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${SuffixBits + 1} - mj AS INT))"))
        .as("s_present"),
      count(lit(1)).as("n_present"))
    val est = agg
      .withColumn("zeros", lit(M.toLong) - col("n_present"))
      .withColumn("s_total", col("s_present") + col("zeros") * lit(Unit))
      .withColumn("e",
        lit(Alpha) * lit((M * M).toDouble) * lit(Unit.toDouble) /
          col("s_total").cast("double"))
      .withColumn("hll_est", graft.functions.StableRound.tieStableRound(
        when(col("e") <= lit(2.5 * M) && col("zeros") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("zeros").cast("double")))
          .otherwise(col("e")), 6))
    val exact = df.groupBy(g: _*)
      .agg(countDistinct(col(valueCol)).as("exact"))
    est.select(g :+ col("hll_est"): _*).join(exact, groupCols)
  }
}
