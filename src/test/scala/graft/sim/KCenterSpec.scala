package graft.sim

import graft.SparkSpec

class KCenterSpec extends SparkSpec {
  import spark.implicits._

  // three far-apart blobs plus the seed's own blob — greedy must visit
  // each blob before refining within one
  private val pts = Seq(
    (1L, Seq(0L, 0L)), (2L, Seq(1L, 0L)),
    (10L, Seq(100L, 0L)), (11L, Seq(101L, 0L)),
    (20L, Seq(0L, 100L)), (21L, Seq(1L, 100L))
  ).toDF("id", "x")

  private def centers(k: Int): Seq[(Int, Long, Long)] =
    KCenter.select(pts, k, dims = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)

  test("greedy farthest-point covers every blob before refining one") {
    val c = centers(3)
    assert(c.head == ((1, 1L, 0L))) // seed = smallest id, d2 = 0
    val blobs = c.map(_._2).map {
      case i if i < 10 => "a"; case i if i < 20 => "b"; case _ => "c"
    }
    assert(blobs.toSet.size == 3)
  }

  test("d2 sequence is the non-increasing covering radius") {
    val ds = centers(5).map(_._3)
    assert(ds.head == 0L)
    assert(ds.tail.zip(ds.tail.tail).forall { case (a, b) => a >= b })
  }

  test("argmax ties break to the smallest id") {
    // two points equidistant from the seed
    val sym = Seq((1L, Seq(0L)), (5L, Seq(10L)), (9L, Seq(-10L))).toDF("id", "x")
    val c = KCenter.select(sym, k = 2, dims = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(c(2) == 5L)
  }
}
