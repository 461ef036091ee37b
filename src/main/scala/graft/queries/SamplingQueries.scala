package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.{Pii, TextOps}
import graft.pipeline.Sampling

/** Corpus-curation operators a training-data pipeline runs before
  * training: PII scrubbing, deterministic train/val splits, and global
  * token-budget cuts. All three are fully DuckDB-oracled — the SQL twins
  * reuse the exact pattern/hash constants so the hashes pin semantics,
  * not just row counts.
  */
object SamplingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q51 — PII scan + redaction. The synthetic corpus carries no natural
    * PII, so the scan runs over a deterministically derived contact
    * header (email + phone + IP built from doc_id) prepended to the real
    * text: every regex sees real traffic and the redacted length proves
    * the rewrite happened. Pure codegen'd string expressions. */
  private def withContact(docs: DataFrame): DataFrame =
    docs.withColumn("contact",
      concat(
        lit("reach user"), col("doc_id").cast("string"),
        lit(" at user"), col("doc_id").cast("string"),
        lit("@mail"), (col("doc_id") % 100).cast("string"),
        lit(".example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10."), (col("doc_id") % 256).cast("string"),
        lit(".0.1 :: "), col("text")))

  private val q51: Q = (s, dir) => {
    withContact(Tables.documents(s, dir))
      .select(col("doc_id"),
        Pii.countEmails(col("contact")).cast("int").as("n_emails"),
        Pii.countPhones(col("contact")).cast("int").as("n_phones"),
        Pii.countIpv4s(col("contact")).cast("int").as("n_ipv4"),
        length(Pii.redact(col("contact"))).as("red_len"))
      .orderBy(col("doc_id"))
  }

  private val q51Sql = {
    // literal re-use of Pii's patterns (same Java/RE2-common subset);
    // DuckDB string literals don't escape backslash, so verbatim is right
    val email = Pii.emailRe
    val phone = Pii.phoneRe
    val ipv4 = Pii.ipv4Re
    s"""WITH c AS (
         SELECT doc_id,
           'reach user' || doc_id || ' at user' || doc_id || '@mail' ||
           (doc_id % 100) || '.example.com or +1-555-' ||
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
           ' ip 10.' || (doc_id % 256) || '.0.1 :: ' || text AS contact
         FROM documents)
       SELECT doc_id,
         CAST(len(regexp_extract_all(contact, '$email')) AS INTEGER) AS n_emails,
         CAST(len(regexp_extract_all(contact, '$phone')) AS INTEGER) AS n_phones,
         CAST(len(regexp_extract_all(contact, '$ipv4')) AS INTEGER) AS n_ipv4,
         CAST(length(regexp_replace(regexp_replace(regexp_replace(contact,
           '$email', '[EMAIL]', 'g'), '$phone', '[PHONE]', 'g'),
           '$ipv4', '[IP]', 'g')) AS INTEGER) AS red_len
       FROM c ORDER BY doc_id"""
  }

  /** q52 — deterministic hash split (13/16 ≈ 81% train), stratification
    * audited per source. Content-addressed md5 assignment: stable under
    * re-runs and corpus growth, unlike rand(). Scan-local expression +
    * one small aggregation. */
  private val q52: Q = (s, dir) => {
    Tables.documents(s, dir)
      .withColumn("split", Sampling.hashSplit(col("doc_id"), 13))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"), col("split"))
  }

  private val q52Sql =
    """SELECT source,
         CASE WHEN strpos('0123456789abc', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) > 0
              THEN 'train' ELSE 'val' END AS split,
         count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM documents GROUP BY 1, 2 ORDER BY source, split"""

  /** q53 — global token-budget cut: keep documents in doc_id order until
    * 60% of the corpus' tokens are spent, then audit the kept set per
    * source. The running sum is the distributed two-level prefix sum
    * (graft.scale.PrefixSum) — no single-partition global window; the
    * DuckDB twin uses the textbook global window, which is exactly the
    * semantics the distributed construction must reproduce. */
  private val q53: Q = (s, dir) => {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        TextOps.tokenCount(col("text")).cast("long").as("ntok"))
    Sampling.budgetSampleFraction(t, "doc_id", "ntok", 0.6, bucketSize = 256)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("ntok")).as("tokens_kept"))
      .orderBy(col("source"))
  }

  private val q53Sql =
    """WITH t AS (
         SELECT doc_id, source,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS ntok
         FROM documents),
       b AS (SELECT CAST(floor(0.6 * CAST(sum(ntok) AS DOUBLE)) AS BIGINT) AS budget FROM t),
       c AS (SELECT doc_id, source, ntok,
               sum(ntok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM t)
       SELECT source, count(*) AS n_kept, CAST(sum(ntok) AS BIGINT) AS tokens_kept
       FROM c, b WHERE cum <= budget GROUP BY source ORDER BY source"""

  /** q54 — deterministic source-mixture sampling: per-source keep
    * fractions via md5-prefix thresholds (hash-threshold Bernoulli), NOT
    * a row_number window per source (whose partition would be a whole
    * source — the skew cliff). Fractions cycle 0.8/0.6/0.4/0.2 over the
    * testdata's src0..src19; unknown sources drop (default 0.0). */
  private val mixtureFractions: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> Seq(0.8, 0.6, 0.4, 0.2)(i % 4)).toMap

  private val q54: Q = (s, dir) => {
    Tables.documents(s, dir)
      .filter(Sampling.mixtureKeep(col("doc_id"), col("source"),
        mixtureFractions, defaultFraction = 0.0))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  private val q54Sql = {
    val cases = mixtureFractions.toSeq.sortBy(_._1).map { case (src, f) =>
      s"WHEN source = '$src' THEN '${Sampling.hexThreshold(f)}'"
    }.mkString(" ")
    s"""SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       FROM documents
       WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < CASE $cases ELSE '0000' END
       GROUP BY source ORDER BY source"""
  }

  /** q55 — Gopher-style repetition signals per document: most-frequent-
    * token fraction (explode → two narrow (doc_id, token)-keyed
    * aggregations — no per-doc window) and duplicate-bigram fraction
    * (pure array expression). Both tie-stable rounded for the oracle. */
  private val q55: Q = (s, dir) => {
    import graft.functions.StableRound
    val docs = Tables.documents(s, dir).filter(length(trim(col("text"))) > 0)
    val dup = docs.select(col("doc_id"),
      TextOps.dupNgramFrac(col("text"), 2).as("rawdup"))
    val top = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("mx"), sum(col("c")).as("tot"))
    dup.join(top, Seq("doc_id"))
      .select(col("doc_id"),
        StableRound.tieStableRound(col("mx").cast("double") / col("tot"), 4)
          .as("top_token_frac"),
        StableRound.tieStableRound(col("rawdup"), 4).as("dup_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  private val q55Sql = {
    import graft.functions.StableRound
    val topFrac = StableRound.sql("CAST(mx AS DOUBLE) / tot", 4)
    val dupFrac = StableRound.sql(
      """CASE WHEN len(w) < 3 THEN 0.0
         ELSE 1.0 - CAST(len(list_distinct([array_to_string(w[i:i+1], ' ')
           FOR i IN range(1, len(w))])) AS DOUBLE) / (len(w) - 1) END""", 4)
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                   FROM documents WHERE length(trim(text)) > 0),
       tok AS (SELECT doc_id, unnest(w) AS token FROM t),
       tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
       top AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM tc GROUP BY 1),
       bg AS (SELECT doc_id, $dupFrac AS dup_bigram_frac FROM t)
       SELECT top.doc_id, $topFrac AS top_token_frac, bg.dup_bigram_frac
       FROM top JOIN bg ON top.doc_id = bg.doc_id ORDER BY top.doc_id"""
  }

  /** q56 — sequence packing: docs (doc_id order) assigned to fixed
    * 512-token training bins by where their first token lands; per-bin
    * doc/token counts audit the fill. Same distributed prefix sum as
    * q53; the DuckDB twin is the textbook global window. */
  private val q56: Q = (s, dir) => {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("ntok"))
    Sampling.packBins(t, "doc_id", "ntok", "bin", binTokens = 512, bucketSize = 256)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      .orderBy(col("bin"))
  }

  private val q56Sql =
    """WITH t AS (
         SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS ntok
         FROM documents),
       c AS (SELECT doc_id, ntok,
               sum(ntok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM t)
       SELECT CAST(floor((cum - ntok) / 512) AS BIGINT) AS bin,
              count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens
       FROM c GROUP BY 1 ORDER BY bin"""

  /** q57 — corpus-frequency fluency filter (the CCNet-style LM-quality
    * stage, relationally): per doc, the fraction of its bigrams occurring
    * ≥3 times corpus-wide. Integer-exact ratio (not a float log-prob
    * sum, which is addition-order-dependent and unpinnable). */
  private val q57: Q = (s, dir) => {
    graft.text.CorpusStats.commonNgramFrac(
      Tables.documents(s, dir), "doc_id", "text", n = 2, minCount = 3L)
      .orderBy(col("doc_id"))
  }

  private val q57Sql =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
                  FROM documents WHERE length(trim(text)) > 0),
       g AS (SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
               FOR i IN range(1, len(w))]) AS gram
             FROM t WHERE len(w) >= 2),
       f AS (SELECT gram, count(*) AS c FROM g GROUP BY 1)
       SELECT g.doc_id, count(*) AS n_ngrams,
         floor((CAST(sum(CASE WHEN f.c >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                / count(*)) * 10000 + 0.5) / 10000 AS common_frac
       FROM g JOIN f USING (gram)
       GROUP BY g.doc_id ORDER BY g.doc_id"""

  /** q93 — equal-allocation stratified sample: the 20 hash-smallest
    * parts per brand (content-addressed md5 order, ties by key). The
    * rank filter compiles to WindowGroupLimit — partial top-n before the
    * shuffle — so no stratum's size reaches the window sort. */
  private val q93: Q = (s, dir) =>
    Sampling.stratifiedTopN(
        Tables.part(s, dir).select(col("p_brand"), col("p_partkey")),
        col("p_brand"), col("p_partkey"), n = 20)
      .orderBy(col("p_brand"), col("strat_rank"))

  private val q93Sql =
    """SELECT p_brand, p_partkey, strat_rank FROM (
         SELECT p_brand, p_partkey,
                CAST(row_number() OVER (PARTITION BY p_brand
                  ORDER BY substring(md5(CAST(p_partkey AS VARCHAR)), 1, 8) ASC,
                           p_partkey ASC) AS INTEGER) AS strat_rank
         FROM part)
       WHERE strat_rank <= 20 ORDER BY p_brand, strat_rank"""

  /** q99 — k-anonymity audit (k = 5) over the quasi-identifier combo
    * (nation, market segment): every equivalence class with its size and
    * an at-risk flag — the standard re-identification screen run before
    * releasing training data carrying demographic columns. One
    * map-combined aggregation. */
  private val q99: Q = (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < 5)

  private val q99Sql =
    """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS class_size,
              count(*) < 5 AS at_risk
       FROM customer GROUP BY 1, 2"""

  val defs: Map[String, Q] = Map(
    "q57_fluency"      -> q57,
    "q93_stratified_sample" -> q93,
    "q99_k_anonymity"  -> q99,
    "q51_pii_scrub"    -> q51,
    "q52_hash_split"   -> q52,
    "q53_token_budget" -> q53,
    "q54_mixture"      -> q54,
    "q55_repetition"   -> q55,
    "q56_seq_packing"  -> q56,
  )

  val oracles: Map[String, String] = Map(
    "q51_pii_scrub"    -> q51Sql,
    "q52_hash_split"   -> q52Sql,
    "q53_token_budget" -> q53Sql,
    "q54_mixture"      -> q54Sql,
    "q55_repetition"   -> q55Sql,
    "q56_seq_packing"  -> q56Sql,
    "q57_fluency"      -> q57Sql,
    "q93_stratified_sample" -> q93Sql,
    "q99_k_anonymity"  -> q99Sql,
  )
}
