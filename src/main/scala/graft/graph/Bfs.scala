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
  * reachable set) against co-located edges. Each level persists ONLY its
  * own fragment (the newly reached nodes) and materializes it with a
  * single `count()` — the action that decides termination is the same
  * one that fills the cache, so there is no separate emptiness probe and
  * no per-level rewrite of the whole visited set (the visited relation
  * is the union of the cached per-level fragments: total cache traffic
  * O(V) across the run instead of O(V·depth)). Fragment persistence cuts
  * lineage per level, keeping plan depth linear in `maxDepth`. For
  * unbounded-depth closures at 100 TB, checkpoint every ~10 levels to
  * truncate lineage entirely.
  */
object Bfs {

  /** Minimum-depth reachability: returns (node, depth) for every node
    * reachable from `seeds` in at most `maxDepth` hops, where depth is
    * the BFS level (seeds are depth 0). `edges` must have `src`/`dst`
    * string columns; `seeds` a `node` column. */
  def reach(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).persist()
    val seed = seeds.select(col("node")).distinct()
      .withColumn("depth", lit(0)).persist()
    seed.count()
    var fragments = List(seed) // one cached fragment per level, newest first
    var visited = seed.select(col("node"))
    var frontier = seed.select(col("node"))
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
        .withColumn("depth", lit(level))
        .persist()
      if (next.count() == 0L) { next.unpersist(); done = true }
      else {
        fragments = next :: fragments
        visited = visited.unionByName(next.select(col("node")))
        frontier = next.select(col("node"))
      }
    }
    e.unpersist()
    // union of cached fragments; left persisted: the caller consumes it once
    fragments.reverse.reduce(_ unionByName _)
  }
}
