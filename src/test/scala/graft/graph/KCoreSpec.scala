package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  // triangle a-b-c (2-core) + pendant path c-d-e (peels away in 2 rounds)
  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")
  ).toDF("src", "dst")

  test("2-core: pendant path peels, triangle survives with degree 2") {
    val out = KCore.run(edges, k = 2, rounds = 4)
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("peeling cascades: chain has no 2-core at all") {
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    assert(KCore.run(chain, k = 2, rounds = 4).count() == 0)
  }

  test("k=1 keeps everything connected; self-loops ignored") {
    val g = Seq(("a", "b"), ("c", "c")).toDF("src", "dst")
    val out = KCore.run(g, k = 1, rounds = 3)
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 1L, "b" -> 1L))
  }

  test("fixed point: extra rounds change nothing (4-clique at k=3)") {
    val nodes = Seq("w", "x", "y", "z")
    val clique = (for { a <- nodes; b <- nodes if a < b } yield (a, b))
      .toDF("src", "dst")
    val g = clique.union(Seq(("w", "out")).toDF("src", "dst"))
    val r2 = KCore.run(g, k = 3, rounds = 2).as[(String, Long)].collect().toMap
    val r6 = KCore.run(g, k = 3, rounds = 6).as[(String, Long)].collect().toMap
    assert(r2 === r6 && r6.keySet === Set("w", "x", "y", "z") && r6.values.forall(_ == 3L))
  }
}
