package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (0L, Seq(0.0f, 10.0f)),
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.5f, 5.0f)),
    (3L, Seq(1.0f, 10.0f)),
  ).toDF("vec_id", "embedding")

  test("train finds per-dimension min/max") {
    val cb = Quantize.train(fixture)
    assert(cb.dim == 2)
    assert(cb.mins.toSeq == Seq(0.0, 0.0) && cb.maxs.toSeq == Seq(1.0, 10.0))
  }

  test("encode maps min->0, max->255, midpoint->128, constant-dim->0") {
    val cb = Quantize.train(fixture)
    val codes = fixture.select(col("vec_id"), Quantize.encode(col("embedding"), cb).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == Seq(0, 255))
    assert(codes(1L) == Seq(255, 0))
    assert(codes(2L) == Seq(128, 128)) // floor(0.5*255+0.5)=128
    assert(codes(3L) == Seq(255, 255))
    // constant dimension codes to 0
    val const = Seq((0L, Seq(7.0f)), (1L, Seq(7.0f))).toDF("vec_id", "embedding")
    val ccb = Quantize.train(const)
    assert(const.select(Quantize.encode(col("embedding"), ccb)).collect()
      .forall(_.getSeq[Int](0) == Seq(0)))
  }

  test("codeDot is the exact integer dot product") {
    val df = Seq((Seq(1, 2, 3), Seq(4, 5, 6))).toDF("a", "b")
    assert(df.select(Quantize.codeDot(col("a"), col("b"))).head.getLong(0) == 32L)
  }

  test("zeroPoints are the codes of value 0, clamped into range") {
    val cb = Quantize.AffineCodebook(Array(-1.0, 0.0, 2.0), Array(1.0, 0.0, 4.0))
    // dim0: 0 is midpoint → 128; dim1: constant → 0; dim2: 0 below min → clamp 0
    assert(Quantize.zeroPoints(cb).toSeq == Seq(128, 0, 0))
  }

  test("quantizedTopK ranks by centered-code cosine, excludes self, near-agrees with exact") {
    val emb = graft.Tables.embeddings(spark, sf)
    val cb = Quantize.train(emb)
    val top = Quantize.quantizedTopK(emb.filter(col("vec_id") < 20), emb, cb, k = 5)
    val rows = top.collect()
    assert(rows.length == 20 * 5)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => math.abs(r.getDouble(4)) <= 1.0 + 1e-9))
    // 8-bit centered-code cosine preserves most of the exact cosine
    // top-5 neighborhood (measured ~81% at sf0.001)
    val exact = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val overlap = exact.join(top.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    assert(overlap >= 60, s"quantized/exact top-5 overlap too low: $overlap/100")
  }
}
