package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShortestPathsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (String, String, Long)*) =
    rows.toDF("src", "dst", "w")
  private def seeds(ns: String*) = ns.toDF("node")

  private def distMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("picks the cheaper of two routes, not the fewer-hop one") {
    //      a -1-> b -1-> d      a -5-> d
    val d = distMap(ShortestPaths.run(
      edges(("a", "b", 1L), ("b", "d", 1L), ("a", "d", 5L)), seeds("a"), rounds = 3))
    assert(d == Map("a" -> 0L, "b" -> 1L, "d" -> 2L))
  }

  test("negative edge weights relax correctly (the Dijkstra-breaking case)") {
    // a -10-> b -(-8)-> c  beats  a -3-> c
    val d = distMap(ShortestPaths.run(
      edges(("a", "b", 10L), ("b", "c", -8L), ("a", "c", 3L)), seeds("a"), rounds = 3))
    assert(d("c") == 2L)
  }

  test("multi-source: each node takes the min over all seeds") {
    val d = distMap(ShortestPaths.run(
      edges(("s1", "m", 7L), ("s2", "m", 2L), ("m", "t", 1L)),
      seeds("s1", "s2"), rounds = 3))
    assert(d("m") == 2L && d("t") == 3L)
  }

  test("unreachable nodes are absent; extra rounds are idempotent") {
    val e = edges(("a", "b", 1L), ("x", "y", 1L))
    val d3 = distMap(ShortestPaths.run(e, seeds("a"), rounds = 3))
    val d8 = distMap(ShortestPaths.run(e, seeds("a"), rounds = 8))
    assert(d3 == Map("a" -> 0L, "b" -> 1L))
    assert(d3 == d8)
  }

  test("rounds bound path length: a 3-hop chain needs 3 rounds") {
    val e = edges(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L))
    val d2 = distMap(ShortestPaths.run(e, seeds("a"), rounds = 2))
    val d3 = distMap(ShortestPaths.run(e, seeds("a"), rounds = 3))
    assert(!d2.contains("d") && d3("d") == 3L)
  }
}
