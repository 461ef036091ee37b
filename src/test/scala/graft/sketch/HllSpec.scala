package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate tracks exact cardinality within HLL error bounds") {
    // m=64 → standard error ≈ 1.04/√64 = 13%; allow 3σ ≈ 40%
    val df = (1 to 20000).map(i => ("g", i % 5000)).toDF("grp", "v")
    val r = Hll.estimateDistinct(df, Seq("grp"), "v")
      .as[(String, Double, Long)].head()
    assert(r._3 == 5000L)
    assert(math.abs(r._2 - 5000.0) / 5000.0 < 0.4, s"est=${r._2}")
  }

  test("small cardinalities hit the linear-counting branch and stay close") {
    val df = (1 to 30).map(i => ("g", i)).toDF("grp", "v")
    val r = Hll.estimateDistinct(df, Seq("grp"), "v")
      .as[(String, Double, Long)].head()
    assert(r._3 == 30L)
    assert(math.abs(r._2 - 30.0) / 30.0 < 0.35, s"est=${r._2}")
  }

  test("estimate is per group and duplicate-insensitive") {
    val df = ((1 to 900).map(i => ("a", i % 300)) ++
      (1 to 2000).map(i => ("b", i % 40))).toDF("grp", "v")
    val r = Hll.estimateDistinct(df, Seq("grp"), "v")
      .as[(String, Double, Long)].collect().map(x => x._1 -> x).toMap
    assert(r("a")._3 == 300L && r("b")._3 == 40L)
    // duplicates don't move the sketch: re-unioning the data is a no-op
    val doubled = Hll.estimateDistinct(df.union(df), Seq("grp"), "v")
      .as[(String, Double, Long)].collect().map(x => x._1 -> x._2).toMap
    assert(doubled("a") == r("a")._2 && doubled("b") == r("b")._2)
  }

  test("estimate is independent of partitioning (integer-unit harmonic sum)") {
    val df = (1 to 5000).map(i => ("g", i)).toDF("grp", "v")
    val a = Hll.estimateDistinct(df.coalesce(1), Seq("grp"), "v")
      .as[(String, Double, Long)].head()._2
    val b = Hll.estimateDistinct(df.repartition(13), Seq("grp"), "v")
      .as[(String, Double, Long)].head()._2
    assert(a == b)
  }
}
