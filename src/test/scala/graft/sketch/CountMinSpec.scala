package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: key i appears i times, 1..60 (heavy tail at 60)
  private lazy val df = (1 to 60).flatMap(i => Seq.fill(i)(i)).toDF("k")

  test("cms estimates are never below the true counts") {
    val est = CountMin.estimateCounts(df, "k", d = 4, w = 64)
      .as[(Int, Long)].collect().toMap
    val exact = (1 to 60).map(i => i -> i.toLong).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"key $k: est ${est(k)} < true $c")
    }
  }

  test("cms with an ample grid is exact; heavy hitters rank correctly") {
    // w=1024 for 60 keys → collisions vanishingly unlikely with d=4
    val est = CountMin.estimateCounts(df, "k", d = 4, w = 1024)
      .as[(Int, Long)].collect().toMap
    assert(est(60) === 60L && est(1) === 1L)
    assert(est.toSeq.sortBy(-_._2).head._1 === 60)
  }

  test("sketch grid is bounded by d x w cells") {
    val grid = CountMin.sketch(df, "k", d = 4, w = 16)
    assert(grid.count() <= 4L * 16)
    // total mass per row equals the input size
    val mass = grid.groupBy("_cms_row").agg(sum("_cms_cnt").as("m"))
      .select("m").as[Long].collect()
    assert(mass.forall(_ === df.count()))
  }
}
