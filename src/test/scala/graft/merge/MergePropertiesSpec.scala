package graft.merge

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import com.fasterxml.jackson.databind.ObjectMapper

/** Property tests for the property-merge fold (SURVEY §5: merge
  * commutativity/idempotence — the reference's first-truthy-wins rule is
  * order-DEPENDENT, which is why the engine pins an ordinal; these
  * properties characterize what IS guaranteed). Plain scalacheck Gens
  * sampled deterministically (no scalatestplus bridge in the offline
  * dependency set). */
class MergePropertiesSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
    Gen.choose(-100, 100).map(_.toString),
    Gen.oneOf("true", "false", "null", "\"\""))

  private val listGen: Gen[String] =
    Gen.listOfN(3, Gen.choose(1, 9)).map(_.mkString("[", ",", "]"))

  private val entityGen: Gen[String] = for {
    a <- scalarGen; b <- listGen; hasB <- Gen.oneOf(true, false)
  } yield if (hasB) s"""{"id":"E:1","p":$a,"q":$b}""" else s"""{"id":"E:1","p":$a}"""

  test("merge is idempotent: merge(x, x) == x for scalar properties") {
    samples(scalarGen, 50).foreach { v =>
      val e = s"""{"id":"E:1","p":$v}"""
      val w = PropertyMerge.Warnings()
      val out = PropertyMerge.mergeAll(Seq(e, e), w)
      assert(mapper.readTree(out) == mapper.readTree(e), s"v=$v")
      assert(w.dropped.isEmpty, s"equal values must not be dropped: $v")
    }
  }

  test("fold order determinism: same sequence always gives same result") {
    samples(Gen.listOfN(4, entityGen), 50).foreach { es =>
      val r1 = PropertyMerge.mergeAll(es, PropertyMerge.Warnings())
      val r2 = PropertyMerge.mergeAll(es, PropertyMerge.Warnings())
      assert(r1 == r2)
    }
  }

  test("list merge accumulates all distinct values regardless of order") {
    samples(Gen.listOfN(4, listGen), 50).foreach { ls =>
      val es = ls.map(l => s"""{"id":"E:1","q":$l}""")
      val forward = mapper.readTree(PropertyMerge.mergeAll(es, PropertyMerge.Warnings()))
      val backward = mapper.readTree(PropertyMerge.mergeAll(es.reverse, PropertyMerge.Warnings()))
      assert(forward.get("q") == backward.get("q"), s"ls=$ls")
    }
  }

  test("first truthy scalar wins for any suffix of falsy values") {
    (1 to 5).foreach { n =>
      val es = s"""{"id":"E:1","p":"winner"}""" +: List.fill(n)("""{"id":"E:1","p":""}""")
      val out = mapper.readTree(PropertyMerge.mergeAll(es, PropertyMerge.Warnings()))
      assert(out.get("p").asText() == "winner")
    }
  }
}
