package graft.operators

import graft.SparkSpec

class EvaluationSpec extends SparkSpec {

  test("rocAuc: perfect, random, and tie-corrected cases") {
    import spark.implicits._
    // perfect separation: all positives score above all negatives
    val perfect = Seq(("g", 1L, false), ("g", 2L, false), ("g", 3L, true), ("g", 4L, true))
      .toDF("grp", "s", "lbl")
    val p = Evaluation.rocAuc(perfect, "grp", "s", "lbl").collect().head
    assert(p.getAs[Double]("auc") == 1.0)
    assert(p.getAs[Long]("n_pos") == 2L && p.getAs[Long]("n_neg") == 2L)

    // anti-perfect
    val anti = Seq(("g", 4L, false), ("g", 3L, false), ("g", 1L, true), ("g", 2L, true))
      .toDF("grp", "s", "lbl")
    assert(Evaluation.rocAuc(anti, "grp", "s", "lbl")
      .collect().head.getAs[Double]("auc") == 0.0)

    // all tied on one score: AUC = 0.5 exactly (average-rank correction)
    val tied = Seq(("g", 7L, true), ("g", 7L, false), ("g", 7L, true), ("g", 7L, false))
      .toDF("grp", "s", "lbl")
    assert(Evaluation.rocAuc(tied, "grp", "s", "lbl")
      .collect().head.getAs[Double]("auc") == 0.5)
  }

  test("rocAuc matches a brute-force pair count with half-credit ties") {
    import spark.implicits._
    val rows = Seq(1L -> false, 2L -> true, 2L -> false, 3L -> true, 3L -> false,
      5L -> true, 4L -> false, 6L -> true)
    val df = rows.map { case (s, l) => ("g", s, l) }.toDF("grp", "s", "lbl")
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val credit = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val expect = credit / (pos.size * neg.size)
    val got = Evaluation.rocAuc(df, "grp", "s", "lbl").collect().head.getAs[Double]("auc")
    assert(math.abs(got - expect) < 1e-6)
  }

  test("ksTest: disjoint supports give 1, identical samples give 0") {
    import spark.implicits._
    val disjoint = (1 to 10).map(i => ("g", i.toLong, "a")) ++
      (11 to 20).map(i => ("g", i.toLong, "b"))
    val d = Evaluation.ksTest(disjoint.toDF("grp", "v", "sl"), "grp", "v", "sl")
      .collect().head
    assert(d.getAs[Double]("ks") == 1.0)
    assert(d.getAs[Long]("n_a") == 10L && d.getAs[Long]("n_b") == 10L)

    val same = (1 to 10).flatMap(i => Seq(("g", i.toLong, "a"), ("g", i.toLong, "b")))
    assert(Evaluation.ksTest(same.toDF("grp", "v", "sl"), "grp", "v", "sl")
      .collect().head.getAs[Double]("ks") == 0.0)
  }

  test("ksTest matches a brute-force ECDF sup on mixed samples") {
    import spark.implicits._
    val a = Seq(1L, 2L, 2L, 5L, 9L); val b = Seq(2L, 3L, 7L, 9L)
    val df = (a.map(("g", _, "a")) ++ b.map(("g", _, "b"))).toDF("grp", "v", "sl")
    val values = (a ++ b).distinct.sorted
    val expect = values.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size - b.count(_ <= v).toDouble / b.size)
    }.max
    val got = Evaluation.ksTest(df, "grp", "v", "sl").collect().head.getAs[Double]("ks")
    assert(math.abs(got - expect) < 1e-6)
  }

  test("binaryMetrics: exact confusion counts and single-division ratios") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 3 TP, 1 FP, 2 FN, 4 TN
    val df = (Seq.fill(3)((true, true)) ++ Seq.fill(1)((false, true)) ++
      Seq.fill(2)((true, false)) ++ Seq.fill(4)((false, false)))
      .toDF("actual", "predicted")
    val r = Evaluation.binaryMetrics(df, col("actual"), col("predicted")).collect().head
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((3L, 1L, 2L, 4L)))
    assert(r.getAs[Double]("precision") == 0.75)       // 3/4
    assert(r.getAs[Double]("recall") == 0.6)           // 3/5
    assert(r.getAs[Double]("f1") == 0.666667)          // 6/9 rounded at 6
    assert(r.getAs[Double]("accuracy") == 0.7)         // 7/10
  }

  test("binaryMetrics: degenerate denominators are null, not fabricated 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val allNeg = Seq((false, false), (false, false)).toDF("actual", "predicted")
    val r = Evaluation.binaryMetrics(allNeg, col("actual"), col("predicted")).collect().head
    assert(r.isNullAt(r.fieldIndex("precision"))) // no predicted positives
    assert(r.isNullAt(r.fieldIndex("recall")))    // no actual positives
    assert(r.getAs[Double]("accuracy") == 1.0)
  }
}
