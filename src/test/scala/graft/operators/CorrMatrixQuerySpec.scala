package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** The q117 engine-stable correlation (exact integer co-moments) must agree
  * with Spark's built-in corr() to within the cents-quantization error —
  * the construction changes determinism, not the statistic. */
class CorrMatrixQuerySpec extends SparkSpec {

  test("exact-cents corr matches built-in corr within quantization error") {
    val got = SparkEntry.queries("q117_corr_matrix")(spark, sf)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("corr_price_qty"), r.getAs[Double]("corr_price_disc"))).toMap
    val ref = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_extendedprice"), col("l_quantity")).as("cq"),
           corr(col("l_extendedprice"), col("l_discount")).as("cd"))
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("cq"), r.getAs[Double]("cd"))).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (k, (cq, cd)) =>
      assert(math.abs(cq - ref(k)._1) < 1e-5, s"$k price/qty")
      assert(math.abs(cd - ref(k)._2) < 1e-5, s"$k price/disc")
    }
  }
}
