package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative breadth-first expansion over an edge table — the
  * DataFrame-native replacement for a Pregel superstep loop. Each level
  * is one equi-join of the current frontier against the edge list plus
  * an anti-join against the visited set; Catalyst plans every level
  * independently (AQE sizes the shuffles, and a small frontier is
  * broadcast automatically).
  *
  * Scale shape: the edge table is hash-partitioned by `src` ONCE and
  * persisted, so every level's join shuffles only the frontier (≤ the
  * reachable set) against co-located edges. The frontier and visited
  * sets are persisted per level — the persist cuts lineage, keeping the
  * plan depth linear in `maxDepth` instead of compounding — and each
  * level's inputs are unpersisted as soon as the next level has
  * materialized. For unbounded-depth closures at 100 TB, checkpoint
  * every ~10 levels to truncate lineage entirely.
  */
object Bfs {

  /** Minimum-depth reachability: returns (node, depth) for every node
    * reachable from `seeds` in at most `maxDepth` hops, where depth is
    * the BFS level (seeds are depth 0). `edges` must have `src`/`dst`
    * string columns; `seeds` a `node` column. */
  def reach(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).persist()
    var visited = seeds.select(col("node")).distinct()
      .withColumn("depth", lit(0)).persist()
    var frontier = visited.select(col("node"))
    var prevFrontier: Option[DataFrame] = None
    var level = 0
    var done = false
    while (level < maxDepth && !done) {
      level += 1
      // aliases: after level 1 the frontier derives from `e`, so attribute
      // references would be ambiguous in the self-join without them
      val next = frontier.alias("f")
        .join(e.alias("e"), col("f.node") === col("e.src"))
        .select(col("e.dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .persist()
      if (next.isEmpty) { next.unpersist(); done = true }
      else {
        val grown = visited
          .unionByName(next.withColumn("depth", lit(level))).persist()
        grown.count() // materialize off the persisted parents before dropping them
        visited.unpersist()
        prevFrontier.foreach(_.unpersist())
        visited = grown
        prevFrontier = Some(next)
        frontier = next
      }
    }
    prevFrontier.foreach(_.unpersist())
    e.unpersist()
    visited // left persisted: the caller consumes it exactly once
  }
}
