package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the winnowing sliding-window-minimum deque against a
  * naive O(m·w) reference implementation, plus a pinned example of WHY the
  * oracle surface uses StableRound instead of Spark's round(). Plain
  * scalacheck Gens sampled deterministically (same pattern as
  * MergePropertiesSpec — no scalatestplus bridge offline). */
class WinnowingPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  /** Naive winnowing: the minimum VALUE of every window, distinct sorted —
    * the definition the deque must reproduce (the rightmost-tie rule picks
    * which position is selected, but the emitted value set is the same
    * either way since only hash values are output). */
  private def naive(sh: Array[Long], w: Int): Array[Long] = {
    if (sh.isEmpty) return Array.emptyLongArray
    val windows =
      if (sh.length <= w) Seq(sh.toSeq)
      else sh.toSeq.sliding(w).toSeq
    TextSketch.distinct(windows.map(_.min).toArray)
  }

  test("deque winnowing equals the naive reference on random streams") {
    val gen = for {
      n <- Gen.choose(0, 60)
      w <- Gen.choose(1, 12)
      // small value range forces many ties, stressing the >= pop rule
      xs <- Gen.listOfN(n, Gen.choose(0L, 12L))
    } yield (xs.toArray, w)
    val cases = samples(gen, 300)
    assert(cases.size >= 250) // the generator must actually produce cases
    cases.foreach { case (xs, w) =>
      assert(WinnowingFingerprints.winnow(xs, w).toSeq === naive(xs, w).toSeq,
        s"stream=${xs.toSeq} w=$w")
    }
  }

  test("every window of w consecutive hashes contains a selected fingerprint") {
    val gen = for {
      n <- Gen.choose(12, 80)
      w <- Gen.choose(2, 8)
      xs <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
    } yield (xs.toArray, w)
    samples(gen, 100).foreach { case (xs, w) =>
      val fps = WinnowingFingerprints.winnow(xs, w).toSet
      xs.toSeq.sliding(w).foreach(wnd =>
        assert(wnd.exists(fps.contains), s"uncovered window $wnd (w=$w)"))
    }
  }

  test("StableRound: the documented Spark-vs-raw-double rounding divergence") {
    // 0.72625's nearest double sits just BELOW the printed tie; Spark's
    // round() (BigDecimal of the shortest representation) rounds UP while
    // raw-double floor-rounding rounds DOWN — the exact q31 divergence.
    val d = 0.72625
    assert(BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble === 0.7263)
    assert(math.floor(d * 10000 + 0.5) / 10000 === 0.7262)
  }
}
