package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableRound

/** Corpus collocation mining — the phrase-discovery stage of a tokenizer /
  * vocabulary pipeline (Mikolov et al. 2013 word2phrase; Church & Hanks
  * 1990 PMI): find adjacent word pairs that co-occur far more often than
  * their unigram frequencies predict.
  *
  * The association score is the LIFT p(ab) / (p(a)·p(b)) =
  * c_ab · N / (c_a · c_b) rather than log-PMI: log is strictly monotone in
  * lift, so ranking and thresholding are unchanged, but lift is one
  * division of EXACT integer products — bit-identical in any IEEE engine —
  * while log's libm implementations differ across engines in the last ulp
  * and cannot be hash-pinned. (PMI = ln(lift); callers wanting nats can
  * take the log of the returned column.)
  *
  * Shape at scale: two map-combined groupBys (bigrams, unigrams) and two
  * equi-joins of the bigram table against the unigram counts — the unigram
  * table is vocabulary-sized, so AQE broadcasts it; nothing touches n²
  * and no global window exists. The min-count filter is applied BEFORE
  * the joins, shrinking the bigram table to the interesting tail.
  */
object Collocations {

  /** Adjacent-pair collocations over whitespace-tokenized `textCol`.
    * Output: (w1, w2, c_ab, c_a, c_b, lift) for pairs seen ≥ `minCount`
    * times, lift rounded tie-stably to 6 digits. `n` = total bigram
    * occurrences (the probability denominator) is computed inside the
    * plan — no driver-side collect.
    */
  def mine(docs: DataFrame, textCol: String, minCount: Int): DataFrame = {
    val words = docs
      .select(split(trim(col(textCol)), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val grams = words.select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))")).as("g"))
      .select(col("g.w1"), col("g.w2"))

    val bigramCounts = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    // unigram counts in BIGRAM POSITIONS (left/right occurrences), so the
    // probabilities share one sample space and lift is a true ratio
    val leftCounts  = grams.groupBy(col("w1")).agg(count(lit(1)).as("c_a"))
    val rightCounts = grams.groupBy(col("w2")).agg(count(lit(1)).as("c_b"))
    // one-row total joined in as a cross of a 1-row aggregate (broadcast)
    val total = grams.agg(count(lit(1)).as("n_total"))

    bigramCounts
      .join(leftCounts, Seq("w1"))
      .join(rightCounts, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        StableRound.tieStableRound(
          col("c_ab").cast("double") * col("n_total").cast("double") /
            (col("c_a").cast("double") * col("c_b").cast("double")), 6).as("lift"))
  }

  /** DuckDB oracle twin of [[mine]] — kept beside the Spark code so the
    * two constructions evolve together. */
  def oracleSql(table: String, textCol: String, minCount: Int): String = {
    val lift = StableRound.sql(
      "CAST(c_ab AS DOUBLE) * CAST(n_total AS DOUBLE) / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))", 6)
    s"""WITH t AS (SELECT string_split(trim($textCol), ' ') AS w
                   FROM $table WHERE len(string_split(trim($textCol), ' ')) >= 2),
            g AS (SELECT unnest([w[i] FOR i IN range(1, len(w))]) AS w1,
                         unnest([w[i+1] FOR i IN range(1, len(w))]) AS w2
                  FROM t),
            bc AS (SELECT w1, w2, count(*) AS c_ab FROM g GROUP BY 1, 2
                   HAVING count(*) >= $minCount),
            lc AS (SELECT w1, count(*) AS c_a FROM g GROUP BY 1),
            rc AS (SELECT w2, count(*) AS c_b FROM g GROUP BY 1),
            n AS (SELECT count(*) AS n_total FROM g)
       SELECT w1, w2, c_ab, c_a, c_b, $lift AS lift
       FROM bc JOIN lc USING (w1) JOIN rc USING (w2), n"""
  }
}
