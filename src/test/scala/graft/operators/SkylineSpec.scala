package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  // (group, id, price↓, size↑)
  private lazy val pts = Seq(
    ("g", 1L, 10.0, 5), // dominated by id 2: equal price, strictly smaller size
    ("g", 2L, 10.0, 9), // frontier: best size of the cheapest price
    ("g", 3L, 12.0, 9), // dominated by id 2 (cheaper, same size)
    ("g", 4L, 12.0, 11), // frontier: bigger than any cheaper
    ("g", 5L, 15.0, 11), // dominated by id 4
    ("g", 6L, 15.0, 12), // frontier
    ("g", 7L, 15.0, 12), // exact tie with id 6 → both survive
    ("h", 8L, 99.0, 1)  // lone point in its own group → frontier
  ).toDF("grp", "id", "price", "sz")

  private def ids = Skyline.frontier(pts, Seq("grp"), "price", "sz")
    .select("id").as[Long].collect().toSet

  test("frontier per group: dominance on both axes, strict on one") {
    assert(ids === Set(2L, 4L, 6L, 7L, 8L))
  }

  test("matches the quadratic truth on the same data") {
    val rows = pts.as[(String, Long, Double, Int)].collect()
    val truth = rows.filter { case (g, _, p, s) =>
      !rows.exists { case (g2, _, p2, s2) =>
        g2 == g && p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.map(_._2).toSet
    assert(ids === truth)
  }
}
