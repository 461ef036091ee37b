package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DbscanSpec extends SparkSpec {
  import spark.implicits._

  // cluster A: 4 mutually-ε-close points; cluster B: same, far away;
  // a border point ε-close to one A core but with too few neighbors
  // itself; an isolated noise point. eps = 10, minPts = 4.
  private val pts = Seq(
    (1L, 0L, 0L), (2L, 5L, 0L), (3L, 0L, 5L), (4L, 5L, 5L),        // A cores
    (11L, 100L, 100L), (12L, 105L, 100L), (13L, 100L, 105L), (14L, 105L, 105L), // B cores
    (20L, 13L, 0L),   // within 10 of points 2 (8) only → border of A
    (30L, 500L, 500L) // noise
  ).toDF("id", "x", "y")

  private def run() = Dbscan.run(pts, eps = 10L, minPts = 4)
    .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("cores, borders, and noise are classified; clusters keyed by min core id") {
    val out = run()
    Seq(1L, 2L, 3L, 4L).foreach(i => assert(out(i) == ("core", 1L)))
    Seq(11L, 12L, 13L, 14L).foreach(i => assert(out(i) == ("core", 11L)))
    assert(out(20L) == ("border", 1L))
    assert(out(30L) == ("noise", -1L))
  }

  test("grid blocking finds pairs that straddle cell boundaries") {
    // points 9 apart but in adjacent ε-cells (cell = floor(x/10))
    val straddle = Seq((1L, 9L, 0L), (2L, 18L, 0L), (3L, 11L, 5L), (4L, 14L, -3L))
      .toDF("id", "x", "y")
    val out = Dbscan.run(straddle, eps = 10L, minPts = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // all four are within eps of ≥2 others spanning cells 0/1
    assert(out.values.count(_ == "core") >= 3)
  }

  test("negative coordinates use floor cells, not truncate-toward-zero") {
    // -1 and 1 are 2 apart; int division would put both in cell 0 twice
    // over, floor puts them in cells -1 and 0 — adjacent, still paired
    val neg = Seq((1L, -1L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, -2L, -1L))
      .toDF("id", "x", "y")
    val out = Dbscan.run(neg, eps = 10L, minPts = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.forall(_ == "core"))
  }

  test("minPts=1: an isolated point is a singleton core cluster, not noise") {
    // the degree count includes the point itself, so with minPts=1 every
    // point — even one with zero ε-neighbors — is core
    val iso = Seq((1L, 0L, 0L), (2L, 500L, 500L)).toDF("id", "x", "y")
    val out = Dbscan.run(iso, eps = 10L, minPts = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == ("core", 1L))
    assert(out(2L) == ("core", 2L))
  }

  test("chained cores merge into one cluster (arbitrary-shape property)") {
    // a line of points each within eps of the next only — centroid
    // methods split it, DBSCAN must keep one component
    val chain = (0L until 8L).map(i => (i + 1, i * 9L, 0L)).toDF("id", "x", "y")
    val out = Dbscan.run(chain, eps = 10L, minPts = 3)
    assert(out.filter(col("role") === "core")
      .select("cluster").distinct().count() == 1)
  }
}
