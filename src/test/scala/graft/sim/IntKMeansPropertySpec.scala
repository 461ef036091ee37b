package graft.sim

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the distributed quantized-centroid Lloyd must equal a
  * sequential reference implementation of the same recurrence on random
  * inputs — init, assignment ties, ⌊Σx/n⌋ updates, and empty-cluster
  * carry-over all pinned, not just the fixed spec cases. Deterministic
  * offline Gen sampling (the EvaluationPropertySpec pattern). */
class IntKMeansPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  /** Sequential reference: identical recurrence, scalar code. */
  private def reference(pts: Seq[(Long, Array[Long])], k: Int, dims: Int,
                        iterations: Int): Map[Long, (Int, Long)] = {
    var cents: Array[(Int, Array[Long])] = pts.sortBy(_._1).take(k)
      .map(_._2).zipWithIndex.map { case (x, i) => (i, x) }.toArray
    def assign(c: Array[(Int, Array[Long])]): Map[Long, (Int, Long)] =
      pts.map { case (id, x) =>
        val best = c.map { case (cid, cx) =>
          ((0 until dims).map(i => (x(i) - cx(i)) * (x(i) - cx(i))).sum, cid)
        }.min // (d2, cid) lexicographic = low-cid ties
        id -> ((best._2, best._1))
      }.toMap
    for (_ <- 1 to iterations) {
      val a = assign(cents)
      val byC = pts.groupBy(p => a(p._1)._1)
      cents = cents.map { case (cid, old) =>
        byC.get(cid) match {
          case Some(members) =>
            (cid, (0 until dims).map { i =>
              val s = members.map(_._2(i)).sum
              math.floor(s.toDouble / members.size).toLong
            }.toArray)
          case None => (cid, old) // emptied cluster keeps its centroid
        }
      }
    }
    assign(cents)
  }

  test("assign equals the sequential reference on random inputs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(3, 25)
      k <- Gen.choose(2, 4)
      dims <- Gen.choose(1, 3)
      iters <- Gen.choose(0, 3)
      pts <- Gen.listOfN(n, Gen.listOfN(dims, Gen.choose(-50L, 50L)))
    } yield (k, dims, iters, pts.zipWithIndex.map { case (x, i) =>
      (i.toLong, x.toArray) })
    samples(gen, 10).foreach { case (k, dims, iters, pts) =>
      if (pts.size >= k) {
        val expect = reference(pts, k, dims, iters)
        val got = IntKMeans.assign(
            pts.map { case (id, x) => (id, x.toSeq) }.toDF("id", "x"),
            k, dims, iters)
          .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
        assert(got == expect, s"k=$k dims=$dims iters=$iters pts=${
          pts.map { case (i, x) => i -> x.toSeq }}")
      }
    }
  }
}
