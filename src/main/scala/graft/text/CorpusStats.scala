package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics quality signals — the relational form of the
  * CCNet/Gopher "LM fluency" stage: documents whose n-grams are rare in
  * the corpus read as noise; documents made of corpus-frequent n-grams
  * read as fluent.
  *
  * Deliberately integer-exact: the score is a ratio of counts, not a
  * floating log-prob sum, so results are bit-identical across engines
  * and partitionings (a Σlog(p) over an unordered group is
  * addition-order-dependent — unpinnable in a cross-engine oracle).
  *
  * Scale shape: one explode → count aggregation keyed by the n-gram
  * (map-side partial), one join of doc n-grams against those counts on
  * the same key, one per-doc rollup. No windows, no driver state; the
  * n-gram count table is corpus-vocabulary-sized, not corpus-sized.
  */
object CorpusStats {

  /** Per document: total n-grams and the fraction whose corpus-wide
    * occurrence count is ≥ `minCount` (own occurrences included).
    * Documents with no n-gram (fewer than n tokens) are dropped.
    * Output: idCol, n_ngrams, common_frac (tie-stable rounded). */
  def commonNgramFrac(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, minCount: Long): DataFrame = {
    import graft.functions.StableRound
    // Lazy and plan-transparent on purpose: the exploded n-grams feed two
    // branches (the frequency aggregation and the join probe), so the
    // scan+shingle+explode stage runs twice. An in-operator persist or
    // localCheckpoint would halve that, but it either pins storage with
    // no release point (persist) or truncates the plan into an RDD scan
    // that blinds the surface-wide PlanGuardSpec asserts AND makes the
    // operator eager (localCheckpoint). At scale, persist `docs` (or the
    // exploded grams) at the CALL site where the lifecycle is knowable.
    val grams = docs
      .select(col(idCol), explode(TextOps.shingles(col(textCol), n)).as("_gram"))
    val freq = grams.groupBy(col("_gram")).agg(count(lit(1)).as("_corpus_c"))
    grams.join(freq, Seq("_gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("_corpus_c") >= minCount, 1L).otherwise(0L)).as("_common"))
      .select(col(idCol), col("n_ngrams"),
        StableRound.tieStableRound(
          col("_common").cast("double") / col("n_ngrams"), 4).as("common_frac"))
  }
}
