package graft.retrieval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
  * the standard way a hybrid retrieval stack combines heterogeneous
  * rankers (BM25 + dense vectors, exact + quantized ANN): each list
  * contributes 1/(c + rank) and the fused score is the sum, so no
  * score calibration between backends is needed.
  *
  * Scale shape: the ranked lists are top-k-per-query outputs — already
  * k·|Q| rows, tiny relative to the corpus — so a full outer join on
  * (query, item) plus one window per query is cheap by construction.
  * The fused score sums one term per backend; with two backends that is
  * a two-operand IEEE add (commutative, order-free), which keeps the
  * DuckDB oracle hash-exact without rounding tricks on the sum itself.
  */
object RankFusion {

  /** Fuse two (query_id, itemCol, rank) lists. Output: (query_id, item,
    * rrf, fused_rank) for the top `k` per query, rrf tie-stable-rounded
    * to 9 digits, ties broken by item id. */
  def rrf2(a: DataFrame, b: DataFrame, itemCol: String, k: Int,
           c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val left = a.select(col("query_id"), col(itemCol),
      col("rank").as("rank_a"))
    val right = b.select(col("query_id"), col(itemCol),
      col("rank").as("rank_b"))
    val joined = left.join(right, Seq("query_id", itemCol), "full_outer")
    val contrib = (r: String) => coalesce(
      lit(1.0) / (lit(c.toDouble) + col(r).cast("double")), lit(0.0))
    val win = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col(itemCol).asc)
    joined
      .withColumn("rrf", graft.functions.StableRound.tieStableRound(
        contrib("rank_a") + contrib("rank_b"), 9))
      .withColumn("fused_rank", row_number().over(win))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col(itemCol), col("rrf"), col("fused_rank"))
  }
}
