package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus TF-IDF — the classic keyword-extraction / relevance-weighting
  * operator over the documents table (Salton & Buckley 1988).
  *
  * Scale shape is wordcount: explode(words) → partial-aggregated groupBy
  * (doc, word) for tf, a second groupBy (word) for df — both map-side
  * combined, no self-joins, no windows over unbounded partitions (the
  * final top-k window partitions by doc_id, whose group is vocabulary-
  * bounded per document). The df table is vocabulary-sized; joining it
  * back to tf is a plain shuffle join that AQE will broadcast when the
  * vocabulary is small.
  */
object Tfidf {

  /** Normalized word stream: lowercase, every non-alphanumeric run → one
    * space, whitespace split, empties dropped. Mirrors the DuckDB twin
    * (regexp_replace + string_split) token for token. */
  def words(text: Column): Column =
    filter(split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " "),
      w => length(w) > 0)

  /** Per-document top-k terms by tf·ln(N/df), rank ties broken by word.
    * The score is tie-stable rounded to 6 digits BEFORE ranking so the
    * rank order is reproducible across engines. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one scalar job for N (corpus size) — the idf denominator
    val n = docs.count()
    val w = docs.select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("word"))
    val tf = w.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, Seq("word"))
      .withColumn("score", graft.functions.StableRound.tieStableRound(
        col("tf") * log(lit(n.toDouble) / col("df")), 6))
    val win = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    scored.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("rank"), col("score"))
  }
}
