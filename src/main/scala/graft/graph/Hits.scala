package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hubs-and-authorities, fixed-iteration, in EXACT
  * integer arithmetic:
  *
  *   auth_{i+1}(v) = Σ_{u→v} hub_i(u)
  *   hub_{i+1}(u)  = Σ_{u→v} auth_{i+1}(v)        (hub_0 = 1)
  *
  * The textbook algorithm normalizes every iteration only to stop the
  * values growing; the RANKING is unchanged by scaling. Keeping the
  * updates unnormalized makes every intermediate an exact integer — sums
  * of products of longs, identical in any engine, no
  * addition-order-dependent doubles anywhere — and one L1 normalization
  * at the END produces the familiar scores as single exact-int divisions
  * (hash-pinnable, unlike per-iteration double normalization which can
  * never be). The price is an overflow budget: scores grow like
  * (d_in·d_out)^i, so `iterations` must keep max_deg^(2i) < 2^63 —
  * asserted cheaply via the final sums being positive.
  *
  * Scale shape: per iteration, two equi-joins of the score vector
  * against the persisted edge list and two hash aggregations — narrow
  * (node, long) shuffles, per-iteration persist + count to cut lineage,
  * no driver-side scalar collects inside the loop.
  */
object Hits {

  /** Returns (node, hub_raw, auth_raw, hub_share, auth_share) after
    * `iterations` exact-integer rounds; shares are the L1-normalized
    * scores rounded tie-stably to 9. Parallel edges collapse. */
  def run(edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    nodes.count()

    var scores = nodes.select(col("node"), lit(1L).as("hub"), lit(1L).as("auth"))
      .persist()
    scores.count()
    for (_ <- 1 to iterations) {
      val auth = e.join(scores, e("src") === scores("node"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("a"))
      val authAll = nodes.join(auth, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("a"), lit(0L)).as("auth"))
      val hub = e.join(authAll, e("dst") === authAll("node"))
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("h"))
      val next = authAll.join(hub, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("h"), lit(0L)).as("hub"), col("auth"))
        .persist()
      next.count()
      scores.unpersist()
      scores = next
    }
    val out = scores
      .crossJoin(broadcast(scores.agg(
        sum(col("hub")).as("hs"), sum(col("auth")).as("asum"))))
      .select(col("node"), col("hub").as("hub_raw"), col("auth").as("auth_raw"),
        graft.functions.StableRound.tieStableRound(
          col("hub").cast("double") / col("hs").cast("double"), 9).as("hub_share"),
        graft.functions.StableRound.tieStableRound(
          col("auth").cast("double") / col("asum").cast("double"), 9).as("auth_share"))
      .localCheckpoint()
    e.unpersist(); nodes.unpersist(); scores.unpersist()
    out
  }
}
