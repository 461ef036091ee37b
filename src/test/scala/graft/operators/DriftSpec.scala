package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  test("chi2 matches the hand-computed homogeneity statistic") {
    import spark.implicits._
    // category X: 30 in a, 10 in b; category Y: 20 in a, 40 in b
    val rows = Seq.fill(30)(("X", "a")) ++ Seq.fill(10)(("X", "b")) ++
      Seq.fill(20)(("Y", "a")) ++ Seq.fill(40)(("Y", "b"))
    val out = Drift.chi2(rows.toDF("cat", "sl"), "cat", "sl")
      .collect().map(r => r.getAs[String]("category") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("chi2"))).toMap

    assert(out("X")._1 == 30 && out("X")._2 == 10)
    // N=100, t_a=50, t_b=50; X: rt=40, e=20/20 → (10²/20)·2 = 10
    assert(math.abs(out("X")._3 - 10.0) < 1e-6)
    // Y: rt=60, e=30/30 → (10²/30)·2 = 6.666667
    assert(math.abs(out("Y")._3 - 20.0 / 3.0) < 1e-4)
  }

  test("identical distributions yield zero chi2") {
    import spark.implicits._
    val rows = Seq.fill(5)(("X", "a")) ++ Seq.fill(5)(("X", "b")) ++
      Seq.fill(7)(("Y", "a")) ++ Seq.fill(7)(("Y", "b"))
    val out = Drift.chi2(rows.toDF("cat", "sl"), "cat", "sl").collect()
    assert(out.forall(_.getAs[Double]("chi2") == 0.0))
  }
}
