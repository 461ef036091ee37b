package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the distributed rank-sum AUC and cross-multiplied KS
  * must equal their brute-force definitions on random inputs — the
  * integer constructions are exact, so equality is to rounding precision
  * (1e-6), not a tolerance band. Deterministic Gen sampling, same offline
  * pattern as WinnowingPropertySpec. */
class EvaluationPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(41L + i)))

  test("rocAuc equals brute-force half-credit pair counting on random data") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0L, 8L) // small range forces heavy ties
        l <- Gen.oneOf(true, false)
      } yield (s, l))
    } yield rows
    samples(gen, 12).foreach { rows =>
      val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val credit = (for (p <- pos; n <- neg)
          yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val expect = credit / (pos.size.toDouble * neg.size)
        val got = Evaluation.rocAuc(rows.map { case (s, l) => ("g", s, l) }
            .toDF("grp", "s", "lbl"), "grp", "s", "lbl")
          .collect().head.getAs[Double]("auc")
        assert(math.abs(got - expect) < 1e-6, s"rows=$rows")
      }
    }
  }

  test("ksTest equals brute-force ECDF sup on random data") {
    import spark.implicits._
    val gen = for {
      na <- Gen.choose(3, 40); nb <- Gen.choose(3, 40)
      a <- Gen.listOfN(na, Gen.choose(0L, 12L))
      b <- Gen.listOfN(nb, Gen.choose(0L, 12L))
    } yield (a, b)
    samples(gen, 12).foreach { case (a, b) =>
      val values = (a ++ b).distinct.sorted
      val expect = values.map { v =>
        math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
      }.max
      val got = Evaluation.ksTest(
          (a.map(("g", _, "a")) ++ b.map(("g", _, "b"))).toDF("grp", "v", "sl"),
          "grp", "v", "sl")
        .collect().head.getAs[Double]("ks")
      assert(math.abs(got - expect) < 1e-6, s"a=$a b=$b")
    }
  }
}
