package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.StableRound

/** Categorical distribution-drift audit — the χ² test of homogeneity
  * between two corpus slices (train vs validation split, yesterday's
  * snapshot vs today's): per category, observed counts in each slice vs
  * the expected counts under the pooled distribution, and the category's
  * χ² contribution. A pipeline gates on the total (or per-category) χ²
  * exceeding the critical value for its degrees of freedom.
  *
  * Engine-stable by construction: every input to the arithmetic is an
  * exact integer count; expected = rowTotal·colTotal/N and the squared
  * deviations are single IEEE operations on exactly-representable
  * values, and the two cells are added in a FIXED order (a then b) in
  * both engines, so the result hash-pins without tolerance.
  *
  * Shape at scale: one map-combined groupBy(category, slice) over the
  * corpus — counts only, no row movement beyond the tiny category
  * aggregate; the totals join is a broadcast of a category-cardinality
  * table. No window, no collect.
  */
object Drift {

  /** Per-category χ² contributions between the two values of `sliceCol`
    * (must be exactly "a"/"b"). Output: (category, n_a, n_b, chi2),
    * chi2 tie-stably rounded to 6. */
  def chi2(df: DataFrame, categoryCol: String, sliceCol: String): DataFrame = {
    val cells = df.groupBy(col(categoryCol).as("category"))
      .agg(sum(when(col(sliceCol) === "a", 1L).otherwise(0L)).as("n_a"),
           sum(when(col(sliceCol) === "b", 1L).otherwise(0L)).as("n_b"))
    val totals = cells.agg(sum(col("n_a")).as("t_a"), sum(col("n_b")).as("t_b"))
    val n   = (col("t_a") + col("t_b")).cast("double")
    val rt  = (col("n_a") + col("n_b")).cast("double")
    val eA  = rt * col("t_a").cast("double") / n
    val eB  = rt * col("t_b").cast("double") / n
    val cA  = (col("n_a").cast("double") - eA) * (col("n_a").cast("double") - eA) / eA
    val cB  = (col("n_b").cast("double") - eB) * (col("n_b").cast("double") - eB) / eB
    cells.crossJoin(broadcast(totals))
      .select(col("category"), col("n_a"), col("n_b"),
        StableRound.tieStableRound(cA + cB, 6).as("chi2"))
  }

  /** DuckDB oracle twin of [[chi2]]: identical construction, identical
    * operation order. `sliceExpr` must yield 'a'/'b'. */
  def oracleSql(table: String, categoryExpr: String, sliceExpr: String): String = {
    val eA = "(CAST(n_a + n_b AS DOUBLE) * CAST(t_a AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))"
    val eB = "(CAST(n_a + n_b AS DOUBLE) * CAST(t_b AS DOUBLE) / CAST(t_a + t_b AS DOUBLE))"
    val chi = StableRound.sql(
      s"(CAST(n_a AS DOUBLE) - $eA) * (CAST(n_a AS DOUBLE) - $eA) / $eA + " +
      s"(CAST(n_b AS DOUBLE) - $eB) * (CAST(n_b AS DOUBLE) - $eB) / $eB", 6)
    s"""WITH cells AS (
          SELECT $categoryExpr AS category,
                 CAST(sum(CASE WHEN $sliceExpr = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN $sliceExpr = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM $table GROUP BY 1),
        totals AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM cells)
       SELECT category, n_a, n_b, $chi AS chi2 FROM cells, totals"""
  }
}
