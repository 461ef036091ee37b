package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): score every raw document by how much its unigram
  * distribution looks like a target corpus, log p_target(doc) −
  * p_raw(doc) under add-one-smoothed unigram LMs. The standard cheap
  * pretraining-data selector: rank the raw pool by importance weight,
  * keep the top slice (or Gumbel-resample against the weights).
  *
  * Scale shape is wordcount: one explode over the corpus, two
  * vocab-sized aggregations (target counts, raw counts), then the
  * vocab-sized log-ratio table joins back into the per-(doc, word) tf
  * stream and one map-combined groupBy(doc) sums the weights. No
  * self-joins, no windows, AQE free to broadcast the vocab table.
  *
  * Determinism: per-doc totals would be order-dependent IEEE sums, so
  * each word's log-ratio is rounded to integer MICRO-NATS first and the
  * per-doc score accumulates as exact BIGINT micro-nats — bit-identical
  * in any engine, any partitioning, any addition order.
  */
object Dsir {

  /** Importance score per document in micro-nats. `isTarget` marks the
    * target-domain rows inside `docs`; both LMs share the raw corpus
    * vocabulary (smoothing V). Output: (doc_id, n_terms, score_micro). */
  def importance(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(Tfidf.words(col(textCol))).as("word"))
      .groupBy(col("doc_id"), col("is_target"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("word")).agg(
      sum(col("tf")).as("raw_cnt"),
      sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("tgt_cnt"))
    // three bounded scalars: raw tokens, target tokens, vocab size
    val s = vocab.agg(sum(col("raw_cnt")), sum(col("tgt_cnt")),
      count(lit(1))).head()
    val (rawTok, tgtTok, v) = (s.getLong(0), s.getLong(1), s.getLong(2))
    // add-one smoothed log-ratio per word, rounded to integer micro-nats
    // so downstream sums are exact integer arithmetic
    val logRatio =
      log((col("tgt_cnt") + lit(1.0)) / lit((tgtTok + v).toDouble)) -
        log((col("raw_cnt") + lit(1.0)) / lit((rawTok + v).toDouble))
    val lrMicro = vocab.select(col("word"),
      floor(logRatio * lit(1000000.0) + lit(0.5)).cast("long")
        .as("lr_micro"))
    tf.join(lrMicro, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_terms"),
        sum(col("tf") * col("lr_micro")).as("score_micro"))
  }
}
