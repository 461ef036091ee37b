package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (Array[Float]).
  *
  *  - brute-force cosine top-k: the exactness baseline. Query side is
  *    broadcast; corpus scan is embarrassingly parallel; per-partition
  *    top-k via window. O(|Q|·N) — fine when |Q| is bounded.
  *  - LSH (random hyperplanes): h sign-bits → bucket; top-k within bucket.
  *    The scale path: one shuffle on bucket id, corpus never self-joined.
  *    Hyperplanes are generated from a fixed seed on the driver and folded
  *    into the plan as literals — deterministic, no state.
  *
  * All dot products are expression-level (`zip_with` + `aggregate`),
  * computed in double precision.
  */
object Similarity {

  /** dot(a, b) in double precision — custom codegen Expression (a tight
    * primitive loop; zip_with/aggregate would box per element). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass codegen cosine; accumulation order matches the
    * dot/(‖a‖·‖b‖) composition exactly. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSimilarity(a, b)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Deterministic random hyperplanes: h planes × dim, seeded. */
  def hyperplanes(h: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(h)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for a vector column. */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit(_)): _*)
      when(dot(vec, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN top-k: queries and corpus bucketed by the same
    * hyperplanes; candidates only meet within a bucket. Recall < 1 by
    * construction; raise h for precision, lower for recall. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, h: Int = 8,
              dim: Int = 64, idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = hyperplanes(h, dim, seed)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("c_vec")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ τ, via LSH buckets (scale
    * path) or exact within-bucket verify. id_a < id_b. */
  def nearDupPairs(df: DataFrame, tau: Double, h: Int = 8, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(h, dim)
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("score") >= tau)
      .select(col("id_a"), col("id_b"), col("score"))
      .dropDuplicates("id_a", "id_b")
  }
}
