package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 full-text relevance scoring (Robertson & Zaragoza 2009) —
  * the lexical half of a retrieval / RAG stack, and the classic ranking
  * function a training-data pipeline uses for query-driven corpus
  * selection.
  *
  * Scale shape is wordcount plus one broadcast: explode(words) → one
  * map-combined groupBy (doc, word) for tf, a vocab-sized groupBy for
  * df, a doc-sized groupBy for dl, then the (tiny) query-term table
  * broadcast-joins into tf — the corpus is touched once, no self-joins,
  * and the only window partitions by query_id over candidate documents.
  * idf uses the Lucene formulation ln(1 + (N − df + ½)/(df + ½)), which
  * stays positive for every df.
  *
  * Determinism contract for the DuckDB oracle: per-(doc, term) scores
  * are the identical IEEE expression in both engines, and per-doc
  * totals sum at most TWO terms (queries here are two-term), so the
  * cross-engine hash relies only on addition commutativity, never
  * associativity. Wider queries should pre-round term scores to integer
  * micro-units (the q94 DSIR pattern) before summing.
  */
object Bm25 {

  /** tf per (doc, word) over the normalized word stream shared with
    * [[graft.text.Tfidf.words]] (the cross-engine tokenizer contract). */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.text.Tfidf.words(col(textCol))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k documents per query by BM25. `queryTerms` is (query_id, word)
    * — small by construction, broadcast into the corpus-sized tf table.
    * Scores are tie-stable-rounded to 6 digits before ranking; rank ties
    * break by doc_id. Output: (query_id, doc_id, rank, score). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: DataFrame, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termFreqs(docs, idCol, textCol)
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // two bounded scalars (corpus size, mean doc length) — one tiny job
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("tot")).head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1) / n
    val idf = log(lit(1.0) +
      (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val termScores = tf
      .join(broadcast(queryTerms), Seq("word"))
      .join(df, Seq("word"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), (idf * tfNorm).as("s"))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    termScores.groupBy(col("query_id"), col("doc_id"))
      .agg(graft.functions.StableRound.tieStableRound(sum(col("s")), 6)
        .as("score"))
      .withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score"))
  }
}
