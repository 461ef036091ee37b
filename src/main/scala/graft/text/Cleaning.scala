package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableRound

/** Corpus-cleaning operators from the published web-pipeline recipes —
  * the Gopher quality rules (Rae et al. 2021, appendix A) and the C4
  * line-level filters (Raffel et al. 2020, §2.2) — expressed as pure
  * Column expressions over a words/lines decomposition so they run
  * inside whole-stage codegen with no UDF and shuffle nothing at all:
  * every rule is per-document map work, embarrassingly parallel at
  * 100 TB.
  */
object Cleaning {

  /** Gopher-style document stats over a single-space token column:
    * word count, mean word length, stop-word hits, short-word fraction.
    * Ratios are exact-integer divisions, tie-stable rounded to 6. */
  def gopherStats(words: Column): Column = {
    val n = size(words)
    val sumLen = aggregate(words, lit(0L), (acc, x) => acc + length(x))
    val stopHits = size(filter(words, w =>
      w.isin("the", "a", "of", "to", "and")))
    val shortHits = size(filter(words, w => length(w) <= 2))
    struct(
      n.cast("long").as("n_words"),
      StableRound.tieStableRound(
        sumLen.cast("double") / n.cast("double"), 6).as("mean_word_len"),
      stopHits.cast("long").as("stop_hits"),
      StableRound.tieStableRound(
        shortHits.cast("double") / n.cast("double"), 6).as("short_frac"))
  }

  /** The Gopher accept decision over [[gopherStats]] output, with the
    * thresholds as parameters (the paper's 50 ≤ words ≤ 100k, 3 ≤ mwl
    * ≤ 10, ≥ 2 stop words, ≤ 10% symbol-ish words — calibrated per
    * corpus). Comparisons run on the tie-stable-rounded ratios so both
    * engines compare identical doubles. */
  def gopherPass(stats: Column, minWords: Long, maxWords: Long,
                 minMwl: Double, maxMwl: Double,
                 minStopHits: Long, maxShortFrac: Double): Column =
    stats.getField("n_words").between(minWords, maxWords) &&
      stats.getField("mean_word_len").between(minMwl, maxMwl) &&
      (stats.getField("stop_hits") >= minStopHits) &&
      (stats.getField("short_frac") <= maxShortFrac)

  /** C4's line keep rule: at least `minWords` words AND terminal
    * punctuation. Returns the kept subset of a lines array. */
  def c4KeepLines(lines: Column, minWords: Int): Column =
    filter(lines, l =>
      (size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= minWords) &&
        l.endsWith("."))

  /** Corpus-wide first-occurrence line dedup (the C4/CCNet paragraph
    * dedup): given (id, pos, line) rows, returns them with a `kept`
    * flag — true iff this (id, pos) is the lexicographically-first
    * occurrence of the line in the corpus (min (id, pos) order).
    *
    * Shape at scale: one groupBy on the line (the 100 TB path groups on
    * a 128-bit line hash instead of the string — same plan, narrower
    * shuffle) + one equi-join back; no window over the corpus, no sort.
    */
  def firstOccurrence(lines: DataFrame, idCol: String, posCol: String,
                      lineCol: String): DataFrame = {
    val first = lines.groupBy(col(lineCol))
      .agg(min(struct(col(idCol), col(posCol))).as("__first"))
    lines.join(first, lineCol)
      .withColumn("kept",
        col(idCol) === col("__first").getField(idCol) &&
          col(posCol) === col("__first").getField(posCol))
      .drop("__first")
  }
}
