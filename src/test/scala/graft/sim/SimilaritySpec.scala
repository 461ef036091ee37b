package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tablesembeddings()
  private def Tablesembeddings() = graft.Tables.embeddings(spark, sf)

  test("cosine of a vector with itself is 1") {
    val v = emb.limit(1)
    val a = v.select(col("vec_id"), col("embedding").as("a"))
    val s = a.withColumn("score", Similarity.cosine(col("a"), col("a"))).head().getAs[Double]("score")
    assert(math.abs(s - 1.0) < 1e-9)
  }

  test("brute-force top-k: k rows per query, scores descending, no self") {
    val out = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb, k = 3).collect()
    assert(out.length == 15)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val scores = sorted.map(_.getAs[Double]("score")).toSeq
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
    }
  }

  test("LSH top-k achieves high recall@1 on clustered data") {
    import spark.implicits._
    // 20 planted clusters × 10 members: members = unit base + small noise,
    // so each vector's true nearest neighbors are its cluster-mates.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val vecs = (for {
      c <- 0 until 20
      base = Array.fill(dim)(rnd.nextGaussian())
      m <- 0 until 10
    } yield ((c * 10 + m).toLong, base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") % 10 === 0)
    val exact = Similarity.bruteForceTopK(queries, vecs, k = 1, vecCol = "embedding").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopK(queries, vecs, k = 1, h = 6, dim = dim).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("near-dup pairs: identical vectors found with score 1") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, tau = 0.99, h = 4, dim = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
