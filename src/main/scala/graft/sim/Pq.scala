package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou et al., "Product quantization for
  * nearest neighbor search", TPAMI 2011) — the heavy-compression leg of
  * the ANN suite (brute → LSH → IVF → SQ8 → PQ).
  *
  * The vector is split into `m` subvectors; each subspace gets its own
  * small k-means codebook (seeded, driver-side on a bounded sample — the
  * same shape as Ivf.train), and a vector is stored as `m` code bytes:
  * 64 float32 dims (256 B) → 8 B at m=8/k=256, a 32× compression. Search
  * is ADC (asymmetric distance computation): the query stays full-
  * precision, its per-subspace dot products with every centroid form m
  * lookup tables of k entries, and a corpus row's score is m table
  * lookups + a fixed-order sum — no per-row float dot against the full
  * vector.
  *
  * Scale shape: the corpus carries only its code arrays (the 32×-smaller
  * column is the point — at 100 TB the full-precision embeddings never
  * re-scan); queries are bounded and broadcast; the scan is
  * embarrassingly parallel with a per-query top-k window. Codebooks are
  * plan literals like the IVF centroids.
  */
object Pq {

  /** `centroids(s)(c)` = centroid c of subspace s (subDim floats). */
  final case class PqIndex(m: Int, k: Int, subDim: Int,
                           centroids: Array[Array[Array[Float]]])

  /** Seeded per-subspace Lloyd's on a bounded sample (same sampling
    * policy as Ivf.train: blind fraction+limit first, exact fraction only
    * for provably small corpora). */
  def train(corpus: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 10,
            vecCol: String = "embedding", sampleCap: Int = 10000,
            seed: Long = 42L, sampleFraction: Double = 0.01): PqIndex = {
    val vecs = corpus.select(col(vecCol))
    val blind = vecs.sample(withReplacement = false, math.min(1.0, sampleFraction), seed)
      .limit(sampleCap).collect()
    val rows =
      if (blind.length >= sampleCap) blind
      else {
        val n = corpus.count()
        if (n <= sampleCap) vecs.collect()
        else vecs.sample(withReplacement = false, math.min(1.0, sampleCap * 1.2 / n), seed)
          .limit(sampleCap).collect()
      }
    val sample = rows.map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val rnd = new scala.util.Random(seed)
    val centroids = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      var cs = rnd.shuffle(sub.indices.toList).take(k).map(sub(_)).toArray
      for (_ <- 0 until iters) {
        val sums = Array.fill(cs.length)(new Array[Double](subDim))
        val counts = new Array[Long](cs.length)
        sub.foreach { v =>
          val c = nearestSub(v, cs)
          counts(c) += 1
          var i = 0; while (i < subDim) { sums(c)(i) += v(i); i += 1 }
        }
        cs = cs.indices.map { c =>
          if (counts(c) == 0) cs(c) else sums(c).map(x => (x / counts(c)).toFloat)
        }.toArray
      }
      cs
    }
    PqIndex(m, k, subDim, centroids)
  }

  private def nearestSub(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def centroidLit(c: Array[Float]): Column = array(c.map(lit(_)): _*)

  /** Per-subspace L2-nearest centroid index: argmin ‖x_s − c‖² =
    * argmax (x_s·c − ‖c‖²/2) — the dot rides the codegen expression, the
    * half-norm is a literal. */
  private def subCode(vec: Column, index: PqIndex, s: Int): Column = {
    val sub = slice(vec, s * index.subDim + 1, index.subDim)
    val scores = array(index.centroids(s).map { c =>
      val halfNorm = c.map(x => x.toDouble * x).sum / 2.0
      graft.functions.VectorExpressions.dotProduct(sub, centroidLit(c)) - lit(halfNorm)
    }: _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** m-byte PQ code array for a vector. */
  def encode(vec: Column, index: PqIndex): Column =
    array((0 until index.m).map(s => subCode(vec, index, s)): _*)

  /** ADC score of a corpus code array against one full-precision query
    * vector column: Σ_s table_s[code_s], tables built as expressions from
    * the query subvectors and the centroid literals. Fixed summation
    * order s = 0..m-1. */
  private def adcScore(qVec: Column, codes: Column, index: PqIndex): Column =
    (0 until index.m).map { s =>
      val sub = slice(qVec, s * index.subDim + 1, index.subDim)
      val table = array(index.centroids(s).map(c =>
        graft.functions.VectorExpressions.dotProduct(sub, centroidLit(c))): _*)
      element_at(table, element_at(codes, s + 1) + 1)
    }.reduce(_ + _)

  /** PQ-ADC top-k: corpus encoded once (m code bytes per row), bounded
    * query set broadcast, rank by ADC dot approximation. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, index: PqIndex, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      encode(col(vecCol), index).as("codes"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", adcScore(col("q_vec"), col("codes"), index))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        graft.functions.StableRound.tieStableRound(col("score"), 6).as("score"))
  }
}
