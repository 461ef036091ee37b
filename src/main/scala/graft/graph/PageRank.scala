package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank as DataFrame joins — the power-iteration
  * formulation, with dangling-node mass redistributed uniformly:
  *
  *   r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u)  +  dangling/N )
  *
  * where `dangling = Σ r(u) over nodes with no out-edges`. With the
  * uniform initial rank 1/N this keeps Σ r(v) = 1 every iteration.
  *
  * Scale shape: per iteration, ONE shuffle — contributions are computed
  * by joining ranks to the (src-partitioned, persisted) out-degree-
  * annotated edge list and hash-aggregating on `dst`; the dangling mass
  * is a scalar aggregate piggybacked on the same pass. Ranks are
  * persisted per iteration to cut lineage (same discipline as
  * [[Bfs]]); a fixed iteration count (the common production choice —
  * convergence-εs are replaced by a budget) keeps the plan bounded.
  * GraphX's Pregel would pin the graph in specialized RDDs; the
  * DataFrame form keeps AQE, codegen, and spill handling, and feeds
  * straight into the rest of the relational pipeline.
  */
object PageRank {

  /** Returns (node, rank) after `iterations` power iterations with
    * damping `d`. `edges` needs `src`/`dst` columns; parallel edges are
    * collapsed (a link counts once, as in the classic formulation). */
  def run(edges: DataFrame, iterations: Int, d: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // src-partitioned once; every iteration's contribution join co-locates on it
    val annotated = e.join(outDeg, "src").repartition(col("src")).persist()
    e.unpersist()

    // The dangling SET is static (nodes with no out-edges); only its rank
    // mass changes per iteration. Flag it once so the per-iteration
    // dangling job is a filter+agg over the CACHED ranks — the earlier
    // shape re-ran a left_anti join against the edge list every
    // iteration. (A broadcast 1-row-aggregate formulation that fused the
    // scalar into the update job was tried and measured 8× SLOWER — the
    // per-iteration BroadcastExchange of a subtree over cached data
    // dominates at this scale; the tiny collect is the cheaper sync.)
    val flagged = nodes.join(
        annotated.select(col("src").as("node")).distinct()
          .withColumn("has_out", lit(true)),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("has_out"), lit(false)).as("has_out"))
      .persist()
    flagged.count()
    nodes.unpersist()

    var ranks = flagged.withColumn("rank", lit(1.0 / n)).persist()
    for (_ <- 1 to iterations) {
      val dangling = ranks.filter(!col("has_out"))
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = annotated
        .join(ranks, annotated("src") === ranks("node"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      val next = flagged.join(contribs, Seq("node"), "left_outer")
        .select(col("node"), col("has_out"),
          (lit((1 - d) / n) +
            lit(d) * (coalesce(col("inflow"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
    }
    annotated.unpersist()
    flagged.unpersist()
    ranks.select(col("node"), col("rank"))
  }
}
