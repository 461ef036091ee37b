package graft.dedup

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: prefix filtering is EXACT — on random corpora and
  * random thresholds the pair set must equal the uncapped brute-force
  * inverted-index truth, pair for pair and jaccard for jaccard. Random
  * docs draw from a small vocabulary so shingle collisions across
  * documents (the thing the prefix must survive) are common. Same
  * deterministic offline Gen pattern as EvaluationPropertySpec. */
class PrefixJoinPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(97L + i)))

  test("selfJoin equals the uncapped brute-force pair set on random corpora") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val gen = for {
      nDocs <- Gen.choose(4, 14)
      tau <- Gen.oneOf(0.3, 0.5, 0.7)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 12)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield (tau, docs)
    samples(gen, 10).foreach { case (tau, docs) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def pairs(out: org.apache.spark.sql.DataFrame) = out
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          r.getAs[Double]("jaccard")).toMap
      val got = pairs(PrefixJoin.selfJoin(df, "doc_id", "text", shingleN = 3, tau = tau))
      val truth = pairs(Dedup.ngramJaccardPairs(df, "doc_id", "text",
        shingleN = 3, minJaccard = tau, dfCap = Int.MaxValue))
      assert(got == truth, s"tau=$tau docs=$docs")
    }
  }
}
