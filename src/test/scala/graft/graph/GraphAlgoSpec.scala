package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphAlgoSpec extends SparkSpec {
  import spark.implicits._

  //  a → b → c → d,  a → c,  e isolated-source → f
  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "f")
  ).toDF("src", "dst")

  test("bfs reach: min depth wins when multiple paths exist") {
    val seeds = Seq("a").toDF("node")
    val out = Bfs.reach(edges, seeds, maxDepth = 3)
      .as[(String, Int)].collect().toMap
    assert(out === Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2))
  }

  test("bfs reach: depth bound cuts the walk") {
    val seeds = Seq("a").toDF("node")
    val out = Bfs.reach(edges, seeds, maxDepth = 1)
      .as[(String, Int)].collect().toMap
    assert(out === Map("a" -> 0, "b" -> 1, "c" -> 1))
  }

  test("bfs reach: early-exit when the frontier drains before maxDepth") {
    val seeds = Seq("e").toDF("node")
    val out = Bfs.reach(edges, seeds, maxDepth = 10)
      .as[(String, Int)].collect().toMap
    assert(out === Map("e" -> 0, "f" -> 1))
  }

  test("pagerank: ranks sum to 1 and sinks accumulate more than sources") {
    val ranks = PageRank.run(edges, iterations = 10)
      .as[(String, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    // d collects mass from the a→…→d chain; a only gets the uniform floor
    assert(ranks("d") > ranks("a"))
    assert(ranks("c") > ranks("b")) // two in-links vs one
  }

  test("pagerank: uniform rank on a symmetric cycle") {
    val cycle = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val ranks = PageRank.run(cycle, iterations = 7)
      .as[(String, Double)].collect().toMap
    ranks.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12))
  }
}
