package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntKMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight blobs on a line, k = 2: init = ids 1,2 (both in blob A),
  // one Lloyd step must pull centroid 1 into blob B
  private val pts = Seq(
    (1L, Seq(0L, 0L)), (2L, Seq(2L, 0L)), (3L, Seq(1L, 1L)),
    (4L, Seq(100L, 0L)), (5L, Seq(102L, 0L)), (6L, Seq(101L, 1L))
  ).toDF("id", "x")

  private def clusters(iters: Int): Map[Long, Int] =
    IntKMeans.assign(pts, k = 2, dims = 2, iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("separates two blobs after one iteration despite same-blob init") {
    val c = clusters(1)
    assert(Set(c(1L), c(2L), c(3L)).size == 1)
    assert(Set(c(4L), c(5L), c(6L)).size == 1)
    assert(c(1L) != c(4L))
  }

  test("fixpoint: more iterations do not change a converged assignment") {
    assert(clusters(2) == clusters(5))
  }

  test("d2 is the exact integer squared distance to the final centroid") {
    val out = IntKMeans.assign(pts, k = 2, dims = 2, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // blob A converged centroid = (floor(3/3), floor(1/3)) = (1, 0)
    assert(out(1L) == 1L) // (0-1)² + 0²
    assert(out(3L) == 1L) // 0² + (1-0)²
  }

  test("ties break to the lowest centroid id deterministically") {
    val sym = Seq((1L, Seq(0L)), (2L, Seq(10L)), (3L, Seq(5L))).toDF("id", "x")
    val c = IntKMeans.assign(sym, k = 2, dims = 1, iterations = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // point 3 is 5 from both init centroids (0 and 10) → cid 0
    assert(c(3L) == 0)
  }

  test("an emptied cluster keeps its previous centroid") {
    // k = 3 but only two distinct locations: one centroid ends up empty
    val degenerate = Seq((1L, Seq(0L)), (2L, Seq(0L)), (3L, Seq(100L)))
      .toDF("id", "x")
    val out = IntKMeans.assign(degenerate, k = 3, dims = 1, iterations = 3)
    assert(out.count() == 3) // no crash, total assignment preserved
  }
}
