package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join: all pairs of strings within a small edit
  * distance, WITHOUT the quadratic all-pairs comparison.
  *
  * The candidate generator is the PassJoin partition scheme (Li, Deng,
  * Feng — VLDB 2011, public literature): split each string into
  * `maxDist + 1` contiguous segments; at most `maxDist` edits exist, so
  * by pigeonhole one segment survives untouched, and its image in the
  * partner string is a VERBATIM substring shifted by at most `maxDist`
  * positions (net insertions/deletions before it). So:
  *
  *  - the shorter string of a pair INDEXES its exact segments under its
  *    own length: key (seg_i, len, segment);
  *  - every string PROBES, for each partner length `kl` in
  *    [len − maxDist, len] and each segment index, the substrings of
  *    itself at the segment's boundary ± maxDist — a bounded ~(d+1)²(2d+1)
  *    keys per string;
  *  - candidates = equi-join of index keys with probe keys, verified by
  *    one `levenshtein` call per distinct candidate pair.
  *
  * Everything is Column expressions (sequence/transform/substring inside
  * whole-stage codegen) feeding one narrow equi-join on short keys — the
  * 100 TB shape: candidates ≪ n², verification cost proportional to the
  * candidate set, the shuffle keys are a few bytes. Exact recall (the
  * pigeonhole argument) is asserted against the all-pairs truth in
  * FuzzyJoinSpec, and q104's oracle recomputes the pair set from the
  * independent all-pairs construction in DuckDB.
  */
object FuzzyJoin {

  /** All pairs (a < b) of distinct non-empty `df(column)` values within
    * `maxDist` Levenshtein edits. Output: (a, b, dist). */
  def selfJoin(df: DataFrame, column: String, maxDist: Int): DataFrame = {
    val d = maxDist
    val n = d + 1 // segments per string
    val strs = df.select(col(column).as("s")).distinct()
      .filter(length(col("s")) > 0)
      .withColumn("len", length(col("s")))

    // Exact segments of s under its own length: the even split, the first
    // (len % n) segments one char wider. st(i) = i·base + min(i, rem).
    val idx = strs
      .select(col("s"), col("len"), posexplode(expr(
        s"""transform(sequence(0, $d), i ->
              substring(s, i * (len div $n) + least(i, len % $n) + 1,
                           (len div $n) + if(i < len % $n, 1, 0)))""")))
      .select(col("s").as("a"), col("pos").as("seg_i"),
        col("len").as("seg_len"), col("col").as("seg"))

    // Probe keys: for each partner length kl ≤ len within d, each segment
    // index i, every start position p in [st−d, st+d] clamped to the
    // string (the clamp window always contains st, so it is never empty).
    val probe = strs
      .select(col("s"), explode(expr(
        s"""flatten(transform(sequence(greatest(1, len - $d), len), kl ->
              flatten(transform(sequence(0, $d), i ->
                transform(
                  sequence(greatest(0, i * (kl div $n) + least(i, kl % $n) - $d),
                           least(len - ((kl div $n) + if(i < kl % $n, 1, 0)),
                                 i * (kl div $n) + least(i, kl % $n) + $d)),
                  p -> struct(
                    i AS seg_i, kl AS seg_len,
                    substring(s, p + 1,
                      (kl div $n) + if(i < kl % $n, 1, 0)) AS seg))))))""")).as("k"))
      .select(col("s").as("b"), col("k.seg_i").as("seg_i"),
        col("k.seg_len").as("seg_len"), col("k.seg").as("seg"))

    // Verify BEFORE the pair-dedup exchange, with the BANDED threshold
    // Levenshtein (O(d·len) early-exit, returns -1 above the bound). On
    // adversarial data — every string sharing one segment verbatim, e.g.
    // a constant "Customer#" prefix — the candidate join degenerates
    // toward n² rows; running full-matrix levenshtein after a distinct()
    // of all those pairs shuffled ~n² string pairs (measured 15.5 s on
    // 2.1k such names). Verifying map-side first means the exchange only
    // carries TRUE matches; a pair surviving via two segments costs one
    // extra cheap banded check instead of a row in the shuffle.
    // The banded kernel returns -1 above the bound and the true distance
    // (necessarily ≤ d) otherwise, so `dist >= 0` alone is the whole
    // verification — the former `&& dist <= d` conjunct was redundant and,
    // because filters collapse into the join condition where codegen does
    // no common-subexpression elimination, it cost a SECOND O(d·len)
    // levenshtein evaluation per candidate pair (3 total with the output
    // projection; the r15 before-plan shows all three). One conjunct =
    // one evaluation per candidate.
    idx.join(probe, Seq("seg_i", "seg_len", "seg"))
      .filter(col("a") =!= col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b"), d))
      .filter(col("dist") >= 0)
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("dist"))
      .distinct()
  }
}
