package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{StableRound, UnicodeNorm}
import graft.text.{BigramLm, Cleaning}

/** The published web-corpus cleaning recipes as oracled queries: Gopher
  * document rules, C4 line filtering, corpus-wide line dedup, Unicode
  * NFC canonicalization, and bigram-LM fluency. The synthetic corpus is
  * single-space lowercase ASCII with no newlines, so — like q51's PII
  * header — line structure and decomposed Unicode are DERIVED
  * deterministically inside both engines (identical regex/concat
  * constructions) before the operator under test runs; the operators
  * themselves are the real, corpus-agnostic implementations.
  */
object CleaningQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q101 — Gopher document-quality rules (Rae et al. 2021): word count
    * bounds, mean-word-length band, minimum stop-word hits, short-word
    * fraction cap — thresholds calibrated to this corpus's distribution
    * so the flag actually discriminates (~70/30). Pure per-row map work:
    * no shuffle at all besides the output. */
  private val q101: Q = (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("st", Cleaning.gopherStats(split(col("text"), " ")))
      .select(col("doc_id"),
        col("st.n_words").as("n_words"),
        col("st.mean_word_len").as("mean_word_len"),
        col("st.stop_hits").as("stop_hits"),
        col("st.short_frac").as("short_frac"),
        Cleaning.gopherPass(col("st"), minWords = 20, maxWords = 90,
          minMwl = 4.0, maxMwl = 5.0, minStopHits = 2,
          maxShortFrac = 0.12).as("gopher_pass"))

  private val q101Sql = {
    val mwl = StableRound.sql(
      "CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum') AS DOUBLE) / CAST(len(w) AS DOUBLE)", 6)
    val sf = StableRound.sql(
      "CAST(len(list_filter(w, x -> length(x) <= 2)) AS DOUBLE) / CAST(len(w) AS DOUBLE)", 6)
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            st AS (SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_words,
                     $mwl AS mean_word_len,
                     CAST(len(list_filter(w, x -> x IN ('the','a','of','to','and'))) AS BIGINT) AS stop_hits,
                     $sf AS short_frac
                   FROM t)
       SELECT doc_id, n_words, mean_word_len, stop_hits, short_frac,
              (n_words BETWEEN 20 AND 90) AND (mean_word_len BETWEEN 4.0 AND 5.0)
                AND stop_hits >= 2 AND short_frac <= 0.12 AS gopher_pass
       FROM st"""
  }

  /** Deterministic line synthesis shared by q102/q103: sentence-final
    * punctuation injected after the corpus words query/sort/key, then
    * split on the newline — identical leftmost non-overlapping
    * regexp_replace in both engines. */
  private def withLines(docs: DataFrame): DataFrame =
    docs.withColumn("lines",
      split(regexp_replace(col("text"), " (query|sort|key) ", " $1.\n"), "\n"))

  private val linesSqlFrom =
    """SELECT doc_id, string_split(
         regexp_replace(text, ' (query|sort|key) ', ' \1.' || chr(10), 'g'),
         chr(10)) AS lines
       FROM documents"""

  /** q102 — C4 line-level filter (Raffel et al. 2020): keep lines with
    * ≥ 5 words ending in terminal punctuation; emit per-doc kept/total
    * line counts and the cleaned length. Per-row map work only. */
  private val q102: Q = (s, dir) =>
    withLines(Tables.documents(s, dir))
      .withColumn("kept", Cleaning.c4KeepLines(col("lines"), minWords = 5))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        length(array_join(col("kept"), "\n")).cast("long").as("clean_len"))

  private val q102Sql =
    s"""WITH t AS ($linesSqlFrom),
            k AS (SELECT doc_id, lines,
                    list_filter(lines, x ->
                      len(regexp_extract_all(x, '\\S+')) >= 5
                      AND x LIKE '%.') AS kept
                  FROM t)
       SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
              CAST(len(kept) AS BIGINT) AS n_kept,
              CAST(coalesce(length(array_to_string(kept, chr(10))), 0) AS BIGINT) AS clean_len
       FROM k"""

  /** q103 — corpus-wide first-occurrence line dedup (the C4/CCNet
    * paragraph dedup): a line survives only at its lexicographically
    * first (doc_id, pos). One groupBy on the line + one join back — at
    * 100 TB the group key is a 128-bit hash, same plan. */
  private val q103: Q = (s, dir) => {
    val lines = withLines(Tables.documents(s, dir))
      .select(col("doc_id"), posexplode(col("lines")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("line"))
    Cleaning.firstOccurrence(lines, "doc_id", "pos", "line")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
  }

  private val q103Sql =
    s"""WITH t AS ($linesSqlFrom),
            l AS (SELECT doc_id,
                         CAST(generate_subscripts(lines, 1) - 1 AS BIGINT) AS pos,
                         unnest(lines) AS line
                  FROM t),
            f AS (SELECT line, min(struct_pack(doc_id := doc_id, pos := pos)) AS first
                  FROM l GROUP BY 1)
       SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_lines,
              CAST(sum(CASE WHEN l.doc_id = f.first.doc_id AND l.pos = f.first.pos
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       FROM l JOIN f USING (line)
       GROUP BY 1"""

  /** q105 — Unicode NFC canonicalization through the native codegen
    * Expression [[graft.functions.NfcNormalize]]. The corpus is ASCII,
    * so a decomposed-form header (e +  ́, i +  ̈ — combining marks) is
    * prepended in both engines; NFC composes it, shortening the string
    * by exactly the combining marks. Oracle: DuckDB's nfc_normalize —
    * an independent implementation of UAX #15. */
  private val q105: Q = (s, dir) => {
    val decomposed = "re\u0301sume\u0301 nai\u0308ve "
    Tables.documents(s, dir)
      .withColumn("raw", concat(lit(decomposed), col("text")))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("len_raw"),
        length(UnicodeNorm.nfcNormalize(col("raw"))).cast("long").as("len_nfc"),
        substring(UnicodeNorm.nfcNormalize(col("raw")), 1, 12).as("nfc_prefix"))
  }

  private val q105Sql = {
    val decomposed = "re\u0301sume\u0301 nai\u0308ve "
    s"""SELECT doc_id,
              CAST(length('$decomposed' || text) AS BIGINT) AS len_raw,
              CAST(length(nfc_normalize('$decomposed' || text)) AS BIGINT) AS len_nfc,
              substr(nfc_normalize('$decomposed' || text), 1, 12) AS nfc_prefix
       FROM documents"""
  }

  /** q109 — URL domain statistics: the per-domain document histogram a
    * web pipeline feeds into domain allow/block lists and mixture
    * weights. The corpus carries no URLs, so — exactly like q51's PII
    * header — a deterministic per-doc URL is derived in both engines;
    * the regexp domain extraction and share aggregation are the real
    * operator. One map-combined groupBy on a low-cardinality key. */
  private val q109: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
      .withColumn("url", concat(lit("http://w"), (col("doc_id") % 50).cast("string"),
        lit(".example"), (col("doc_id") % 7).cast("string"), lit(".com/p"),
        col("doc_id").cast("string")))
      .withColumn("domain", regexp_extract(col("url"), "https?://([^/]+)", 1))
    // one bounded scalar: corpus size, the share denominator
    val total = docs.count().toDouble
    docs.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("domain"), col("n_docs"),
        StableRound.tieStableRound(
          col("n_docs").cast("double") / lit(total), 6).as("share"))
  }

  private val q109Sql = {
    val share = StableRound.sql(
      "CAST(count(*) AS DOUBLE) / (SELECT CAST(count(*) AS DOUBLE) FROM documents)", 6)
    s"""WITH u AS (SELECT regexp_extract(
                     'http://w' || (doc_id % 50) || '.example' || (doc_id % 7) || '.com/p' || doc_id,
                     'https?://([^/]+)', 1) AS domain
                   FROM documents)
       SELECT domain, CAST(count(*) AS BIGINT) AS n_docs, $share AS share
       FROM u GROUP BY 1"""
  }

  /** q111 — directional n-gram containment (Broder): the asymmetric
    * near-dup signal that catches sub-document duplication Jaccard
    * misses ([[graft.dedup.Dedup.containmentPairs]]). Oracle: the same
    * inverted-index construction over shingle STRINGS (hash-free) with
    * both containment directions. */
  private val q111: Q = (s, dir) =>
    graft.dedup.Dedup.containmentPairs(Tables.documents(s, dir),
        "doc_id", "text", shingleN = 3, minContainment = 0.5, dfCap = 100)
      .orderBy(col("id_a"), col("id_b"))

  private val q111Sql = {
    val ab = StableRound.sql("CAST(n_common AS DOUBLE) / CAST(n_a AS DOUBLE)", 4)
    val ba = StableRound.sql("CAST(n_common AS DOUBLE) / CAST(n_b AS DOUBLE)", 4)
    s"""WITH docs AS (
          SELECT doc_id, list_distinct([array_to_string(w[i:i+2], ' ')
                  FOR i IN range(1, greatest(len(w) - 1, 1))]) AS shingles
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
                FROM documents WHERE length(trim(text)) > 0)),
        sized AS (SELECT doc_id, shingles, len(shingles) AS n_shingles
                  FROM docs WHERE len(shingles) > 0),
        inverted AS (SELECT doc_id, n_shingles, unnest(shingles) AS shingle FROM sized),
        hot AS (SELECT shingle FROM inverted GROUP BY shingle HAVING count(*) > 100),
        cold AS (SELECT * FROM inverted WHERE shingle NOT IN (SELECT shingle FROM hot)),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     any_value(a.n_shingles) AS n_a, any_value(b.n_shingles) AS n_b,
                     count(*) AS n_common
              FROM cold a JOIN cold b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
        c AS (SELECT id_a, id_b, $ab AS cont_ab, $ba AS cont_ba FROM p)
       SELECT id_a, id_b, cont_ab, cont_ba FROM c
       WHERE cont_ab >= 0.5 OR cont_ba >= 0.5
       ORDER BY id_a, id_b"""
  }

  /** q107 — bigram-LM fluency score (add-one smoothing, mean conditional
    * probability in exact 1e-9 units — see [[graft.text.BigramLm]]). */
  private val q107: Q = (s, dir) =>
    BigramLm.scoreDocs(Tables.documents(s, dir), "doc_id", "text")

  private val q107Sql = BigramLm.oracleSql("documents", "doc_id", "text")

  val defs: Map[String, Q] = Map(
    "q101_gopher_rules"  -> q101,
    "q102_c4_line_filter" -> q102,
    "q103_line_dedup"    -> q103,
    "q105_unicode_nfc"   -> q105,
    "q107_bigram_lm"     -> q107,
    "q109_url_domains"   -> q109,
    "q111_containment"   -> q111)

  val oracles: Map[String, String] = Map(
    "q101_gopher_rules"  -> q101Sql,
    "q102_c4_line_filter" -> q102Sql,
    "q103_line_dedup"    -> q103Sql,
    "q105_unicode_nfc"   -> q105Sql,
    "q109_url_domains"   -> q109Sql,
    "q111_containment"   -> q111Sql,
    "q107_bigram_lm"     -> q107Sql)
}
