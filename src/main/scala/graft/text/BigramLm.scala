package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableRound

/** Corpus bigram language model with add-one smoothing — the CCNet /
  * Wikipedia-LM fluency stage relationally: train bigram counts over the
  * corpus, score each document by its MEAN smoothed conditional
  * probability p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}·) + V).
  *
  * The usual log-probability sum is addition-order-dependent (doubles),
  * so it cannot be pinned across engines; instead each bigram's
  * probability — one exact-integer-to-double division, bit-identical in
  * any IEEE engine — is rounded to integer 1e-9 units in a single
  * floor(x·1e9 + 0.5) and SUMMED AS LONGS: order-free, engine-free, no
  * transcendental in sight (same trick as the q98 decay units).
  *
  * Shape at scale: bigram training is one map-combined groupBy; scoring
  * joins each document's bigrams against the count tables — the bigram
  * join shuffles on short string keys, the context-count join likewise;
  * both are plain equi-joins AQE can re-plan (broadcast when the trained
  * model is small, skew-split when one bigram dominates).
  */
object BigramLm {

  /** Per-doc (id, n_bigrams, lm_units, lm_score): mean add-one-smoothed
    * conditional bigram probability, in 1e-9 units and rounded to 6. */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs
      .select(col(idCol), split(trim(col(textCol)), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val grams = words.select(col(idCol), posexplode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))")))
      .select(col(idCol), col("pos"), col("col.w1"), col("col.w2"))

    // one bounded scalar: vocabulary size (distinct words incl. last ones)
    val v = words.select(explode(col("w")).as("t")).agg(
      countDistinct(col("t"))).head().getLong(0)

    val bigramCounts = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val contextCounts = grams.groupBy(col("w1"))
      .agg(count(lit(1)).as("c_a"))

    val p = col("c_ab").cast("double") + lit(1.0)
    val q = col("c_a").cast("double") + lit(v.toDouble)
    grams
      .join(bigramCounts, Seq("w1", "w2"))
      .join(contextCounts, Seq("w1"))
      // units = floor(p/q · 1e9 + 0.5) computed in ONE floor — rounding
      // to 9 digits and re-scaling would round-trip the double and can
      // land 1 below the integer it just rounded to
      .withColumn("p_units", floor(p / q * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_units")).as("lm_units"))
      .select(col(idCol), col("n_bigrams"), col("lm_units"),
        StableRound.tieStableRound(
          col("lm_units").cast("double") /
            (col("n_bigrams").cast("double") * lit(1e9)), 6).as("lm_score"))
  }

  /** The DuckDB oracle twin of [[scoreDocs]], parameterized on the doc
    * table/columns — kept beside the Spark code so the two constructions
    * evolve together. */
  def oracleSql(table: String, idCol: String, textCol: String): String = {
    val pUnits =
      "floor((CAST(c_ab AS DOUBLE) + 1.0) / (CAST(c_a AS DOUBLE) + v) * 1e9 + 0.5)"
    val score = StableRound.sql("CAST(lm_units AS DOUBLE) / (CAST(n_bigrams AS DOUBLE) * 1e9)", 6)
    s"""WITH t AS (SELECT $idCol, string_split(trim($textCol), ' ') AS w
                   FROM $table WHERE len(string_split(trim($textCol), ' ')) >= 2),
            g AS (SELECT $idCol,
                         unnest([w[i] FOR i IN range(1, len(w))]) AS w1,
                         unnest([w[i+1] FOR i IN range(1, len(w))]) AS w2
                  FROM t),
            vc AS (SELECT CAST(count(DISTINCT x) AS DOUBLE) AS v
                   FROM (SELECT unnest(w) AS x FROM t)),
            bc AS (SELECT w1, w2, count(*) AS c_ab FROM g GROUP BY 1, 2),
            cc AS (SELECT w1, count(*) AS c_a FROM g GROUP BY 1),
            u AS (SELECT g.$idCol,
                         CAST($pUnits AS BIGINT) AS p_units
                  FROM g JOIN bc USING (w1, w2) JOIN cc USING (w1), vc),
            a AS (SELECT $idCol, CAST(count(*) AS BIGINT) AS n_bigrams,
                         CAST(sum(p_units) AS BIGINT) AS lm_units
                  FROM u GROUP BY 1)
       SELECT $idCol, n_bigrams, lm_units, $score AS lm_score FROM a"""
  }
}
