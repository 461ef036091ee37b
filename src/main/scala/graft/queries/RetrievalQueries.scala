package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableRound
import graft.retrieval.{Bm25, RankFusion}
import graft.sim.{Quantize, Similarity}

/** Retrieval / data-selection operators: BM25 lexical ranking, hybrid
  * reciprocal-rank fusion across two ANN backends, and DSIR importance
  * weighting — the query-driven half of a training-data pipeline (pick
  * documents LIKE a target, retrieve evidence FOR a query). */
object RetrievalQueries {

  private type Q = (SparkSession, String) => DataFrame

  /** The shared DuckDB tokenizer CTE (the [[graft.text.Tfidf.words]]
    * contract): lowercase, non-alphanumeric runs → space, split, drop
    * empties. */
  private val wordsCte =
    """w AS (
         SELECT doc_id, unnest(list_filter(
           string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
           x -> len(x) > 0)) AS word
         FROM documents)"""

  /** q89 — BM25 top-10 per query, queries derived from the corpus itself
    * (terms ranked by document frequency, two terms per query → two
    * queries) so the same construction works at every scale factor. */
  private val q89: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val tf = Bm25.termFreqs(docs, "doc_id", "text")
    val dfTable = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // 4 rows to the driver (distributed TakeOrdered, bounded by construction)
    val top = dfTable.orderBy(col("df").desc, col("word").asc).limit(4)
      .select(col("word")).collect().map(_.getString(0))
    import s.implicits._
    val queryTerms = top.zipWithIndex
      .map { case (w, i) => (i / 2, w) }.toSeq.toDF("query_id", "word")
    Bm25.topK(docs, "doc_id", "text", queryTerms, k = 10)
  }

  private val q89Sql =
    s"""WITH $wordsCte,
       tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
       df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       st AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS tot FROM dl),
       qt AS (SELECT word,
                     CAST((row_number() OVER (ORDER BY df DESC, word ASC) - 1) // 2 AS INTEGER) AS query_id
              FROM df ORDER BY df DESC, word ASC LIMIT 4),
       ts AS (SELECT qt.query_id, tf.doc_id,
                     ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) *
                     ((CAST(tf.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
                      (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (st.tot / st.n)))) AS sc
              FROM tf
              JOIN qt USING (word)
              JOIN df USING (word)
              JOIN dl USING (doc_id), st),
       agg AS (SELECT query_id, doc_id,
                      ${StableRound.sql("sum(sc)", 6)} AS score
               FROM ts GROUP BY 1, 2),
       rk AS (SELECT query_id, doc_id, score,
                     CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
              FROM agg)
       SELECT query_id, doc_id, rank, score FROM rk WHERE rank <= 10
       ORDER BY query_id, rank"""

  /** q90 — hybrid retrieval: reciprocal-rank fusion (c = 60) of the
    * exact-cosine backend (q36) and the SQ8 quantized backend (q63) for
    * the same 50 queries — the production RAG pattern of fusing a
    * high-precision and a compressed ranker without score calibration. */
  private val q90: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 50)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
    val sq8 = Quantize.quantizedTopK(queries, emb, Quantize.train(emb), k = 5)
    RankFusion.rrf2(exact, sq8, "neighbor_id", k = 5)
      .orderBy(col("query_id"), col("fused_rank"))
  }

  private val q90Sql = {
    val rrfExpr = "coalesce(1.0 / (60.0 + CAST(e.rank AS DOUBLE)), 0.0) + " +
      "coalesce(1.0 / (60.0 + CAST(s.rank AS DOUBLE)), 0.0)"
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
       exact_pairs AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                ${StableRound.sql(
        "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))", 6)} AS score
         FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id),
       exact_rk AS (
         SELECT query_id, neighbor_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id ASC) AS INTEGER) AS rank
         FROM exact_pairs QUALIFY rank <= 5),
       sd AS (
         SELECT i AS d, min(CAST(embedding[i] AS DOUBLE)) AS mn,
                max(CAST(embedding[i] AS DOUBLE)) AS mx
         FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)
         GROUP BY i),
       zp AS (
         SELECT d, mn, mx,
           CASE WHEN mx = mn THEN 0
                ELSE greatest(0, least(255,
                  CAST(floor((0 - mn) / (mx - mn) * 255 + 0.5) AS INTEGER)))
           END AS c0
         FROM sd),
       codes AS (
         SELECT vec_id, i AS d,
           (CASE WHEN z.mx = z.mn THEN 0
                 ELSE CAST(floor((CAST(embedding[i] AS DOUBLE) - z.mn) / (z.mx - z.mn) * 255 + 0.5) AS INTEGER)
            END) - z.c0 AS code
         FROM embeddings, unnest(range(1, len(embedding)+1)) AS t(i)
         JOIN zp z ON z.d = i),
       norms AS (SELECT vec_id, CAST(sum(code * code) AS BIGINT) AS nn
                 FROM codes GROUP BY 1),
       dots AS (
         SELECT qc.vec_id AS query_id, c.vec_id AS neighbor_id,
                CAST(sum(qc.code * c.code) AS BIGINT) AS qdot
         FROM codes qc JOIN codes c USING (d)
         WHERE qc.vec_id < 50 AND c.vec_id <> qc.vec_id
         GROUP BY 1, 2),
       sq_scored AS (
         SELECT d.query_id, d.neighbor_id,
                CASE WHEN na.nn = 0 OR nb.nn = 0 THEN 0.0
                     ELSE CAST(d.qdot AS DOUBLE) /
                          sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))
                END AS qcos
         FROM dots d
         JOIN norms na ON na.vec_id = d.query_id
         JOIN norms nb ON nb.vec_id = d.neighbor_id),
       sq_rk AS (
         SELECT query_id, neighbor_id,
                CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY qcos DESC, neighbor_id ASC) AS INTEGER) AS rank
         FROM sq_scored QUALIFY rank <= 5),
       fused AS (
         SELECT coalesce(e.query_id, s.query_id) AS query_id,
                coalesce(e.neighbor_id, s.neighbor_id) AS neighbor_id,
                ${StableRound.sql(rrfExpr, 9)} AS rrf
         FROM exact_rk e FULL OUTER JOIN sq_rk s
           ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id)
       SELECT query_id, neighbor_id, rrf,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY rrf DESC, neighbor_id ASC) AS INTEGER) AS fused_rank
       FROM fused QUALIFY fused_rank <= 5
       ORDER BY query_id, fused_rank"""
  }

  /** q94 — DSIR importance weights (Xie et al. 2023): score every
    * document by log p_target − p_raw under add-one unigram LMs, target
    * = long documents (n_chars ≥ 350). Scores accumulate as exact
    * BIGINT micro-nats, so the oracle is hash-exact regardless of
    * addition order. */
  private val q94: Q = (s, dir) =>
    graft.text.Dsir.importance(Tables.documents(s, dir), "doc_id", "text",
        col("n_chars") >= 350)
      .orderBy(col("doc_id"))

  private val q94Sql =
    s"""WITH wt AS (
         SELECT doc_id, n_chars >= 350 AS is_target, unnest(list_filter(
           string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
           x -> len(x) > 0)) AS word
         FROM documents),
       tf AS (SELECT doc_id, is_target, word, CAST(count(*) AS BIGINT) AS tf
              FROM wt GROUP BY 1, 2, 3),
       vocab AS (SELECT word,
                        CAST(sum(tf) AS BIGINT) AS raw_cnt,
                        CAST(sum(CASE WHEN is_target THEN tf ELSE 0 END) AS BIGINT) AS tgt_cnt
                 FROM tf GROUP BY 1),
       st AS (SELECT CAST(sum(raw_cnt) AS BIGINT) AS raw_tok,
                     CAST(sum(tgt_cnt) AS BIGINT) AS tgt_tok,
                     CAST(count(*) AS BIGINT) AS v
              FROM vocab),
       lr AS (SELECT word,
                     CAST(floor((ln((tgt_cnt + 1.0) / CAST(st.tgt_tok + st.v AS DOUBLE))
                               - ln((raw_cnt + 1.0) / CAST(st.raw_tok + st.v AS DOUBLE)))
                               * 1000000.0 + 0.5) AS BIGINT) AS lr_micro
              FROM vocab, st)
       SELECT tf.doc_id,
              CAST(sum(tf.tf) AS BIGINT) AS n_terms,
              CAST(sum(tf.tf * lr.lr_micro) AS BIGINT) AS score_micro
       FROM tf JOIN lr USING (word)
       GROUP BY 1 ORDER BY doc_id"""

  val defs: Map[String, Q] = Map(
    "q89_bm25"        -> q89,
    "q90_rrf_fusion"  -> q90,
    "q94_dsir"        -> q94)

  val oracles: Map[String, String] = Map(
    "q89_bm25"        -> q89Sql,
    "q90_rrf_fusion"  -> q90Sql,
    "q94_dsir"        -> q94Sql)
}
