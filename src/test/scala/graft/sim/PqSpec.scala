package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sf)

  test("train produces m codebooks of k subDim-sized centroids, deterministically") {
    val a = Pq.train(emb, m = 8, k = 16)
    val b = Pq.train(emb, m = 8, k = 16)
    assert(a.m == 8 && a.k == 16 && a.subDim == 8)
    assert(a.centroids.length == 8 && a.centroids.forall(_.length == 16))
    assert(a.centroids.flatten.flatten.toSeq == b.centroids.flatten.flatten.toSeq)
    intercept[IllegalArgumentException] { Pq.train(emb, m = 7) } // 64 % 7 != 0
  }

  test("encode emits m codes in [0, k)") {
    val index = Pq.train(emb, m = 8, k = 16)
    val codes = emb.select(Pq.encode(col("embedding"), index).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("adcTopK excludes self, returns k rows per query, near-agrees with exact dot") {
    import org.apache.spark.sql.expressions.Window
    val index = Pq.train(emb, m = 8, k = 16)
    val queries = emb.filter(col("vec_id") < 20)
    val top = Pq.adcTopK(queries, emb, index, k = 5)
    val rows = top.collect()
    assert(rows.length == 20 * 5)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val exact = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", graft.functions.VectorExpressions
        .dotProduct(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))
    val overlap = exact.join(top.select(col("query_id"), col("neighbor_id")),
      Seq("query_id", "neighbor_id")).count()
    // 32-bit codes are VERY lossy; require better-than-chance structure,
    // the exact operating figure is pinned by the q66 oracle
    assert(overlap >= 20, s"pq/exact top-5 overlap too low: $overlap/100")
  }
}
