package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension affine) embedding quantization — the compression
  * leg of the ANN suite (next to Similarity.lshTopK and Ivf.topK).
  *
  * At 100 TB the embedding column IS the dataset: float32×64 = 256 B/row,
  * while an 8-bit affine code is 64 B (4×) and the similarity kernel
  * becomes an integer dot product (SIMD-friendly, no FP rounding
  * divergence). This is the standard IVF-SQ8 building block (Johnson et
  * al., "Billion-scale similarity search with GPUs", 2017 — the SQ8
  * variant): train per-dimension (min,max) in ONE corpus pass, encode
  * each vector to codes 0..255, search on codes.
  *
  * Everything here is pure IEEE-754 double arithmetic + integer math, so
  * a DuckDB oracle reproduces the codes and scores BIT-IDENTICALLY (no
  * transcendentals, no accumulation-order sensitivity: the score is an
  * exact integer sum).
  */
object Quantize {

  /** Per-dimension affine codebook. `mins(d)`/`maxs(d)` are exact corpus
    * element values (float32 widened to double), 0-based dimension. */
  final case class AffineCodebook(mins: Array[Double], maxs: Array[Double]) {
    def dim: Int = mins.length
  }

  /** One corpus pass: posexplode → per-dimension min/max. The collect is
    * dimension-bounded (64 rows here, ≤ a few thousand for any real
    * embedding) — same driver-side-scalar shape as Ivf.train. */
  def train(corpus: DataFrame, vecCol: String = "embedding"): AffineCodebook = {
    val rows = corpus.select(posexplode(col(vecCol)))
      .toDF("d", "x")
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .collect()
    require(rows.nonEmpty, "empty corpus")
    val dim = rows.map(_.getInt(0)).max + 1
    val mins = new Array[Double](dim)
    val maxs = new Array[Double](dim)
    rows.foreach { r => mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2) }
    AffineCodebook(mins, maxs)
  }

  /** uint8 code per element: floor((x-mn)/(mx-mn)·255 + 0.5), a constant
    * dimension (mx=mn) coding to 0. Pure double ops in a fixed order —
    * engine-independent. Codes ride as array<int>; at rest they pack to
    * one byte each (the 4× compression is a storage-format property, the
    * search math below only needs the integer values). */
  def encode(vec: Column, cb: AffineCodebook): Column = {
    val mn = array(cb.mins.map(lit(_)): _*)
    val mx = array(cb.maxs.map(lit(_)): _*)
    transform(vec, (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi === lo, lit(0))
        .otherwise(floor((x.cast("double") - lo) / (hi - lo) * 255d + 0.5d).cast("int"))
    })
  }

  /** Integer dot product over two code arrays — exact (≤ 64·255² fits a
    * long with 2⁴⁰ headroom). */
  def codeDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")), lit(0L), (acc, v) => acc + v)

  /** Per-dimension zero-point: the code of value 0.0 (clamped into the
    * code range). Similarity math must run on ZERO-CENTERED codes — a raw
    * affine-code dot is dominated by the quantization offset (Σ(x+off)·
    * (y+off) ranks by vector SUM, not similarity; measured overlap@5 vs
    * exact cosine collapsed to 5% uncentered, 81% centered). */
  def zeroPoints(cb: AffineCodebook): Array[Int] =
    cb.mins.indices.map { d =>
      val (lo, hi) = (cb.mins(d), cb.maxs(d))
      if (hi == lo) 0
      else math.max(0, math.min(255, math.floor((0d - lo) / (hi - lo) * 255d + 0.5d).toInt))
    }.toArray

  /** Codes shifted by the zero-point — the similarity-ready form
    * (range [-255, 255]; dots ≤ 64·255² still exact in a long). */
  def centeredEncode(vec: Column, cb: AffineCodebook): Column = {
    val zp = array(zeroPoints(cb).map(lit(_)): _*)
    transform(encode(vec, cb), (c, i) => c - element_at(zp, i + 1))
  }

  /** Quantized top-k: queries (bounded, broadcast) against the encoded
    * corpus; rank by code-space cosine — qdot/√(‖a‖²·‖b‖²) over centered
    * codes, where the three sums are exact integers (order-free) and the
    * final divide+sqrt are single correctly-rounded IEEE ops, so the
    * score is bit-identical in any engine. Neighbor id is the total-order
    * tiebreak. The corpus side encodes on the fly here; a production
    * index stores the codes once (write `centeredEncode(...)` to the
    * table) and this becomes a scan of the 4×-smaller column. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, cb: AffineCodebook,
                    k: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // self-norms are per-SIDE quantities: fold them once per query (|Q|
    // rows) and once per corpus row (n rows) BEFORE the |Q|·n join, not
    // per pair — at 5000×50 pairs that is 3× fewer 64-element folds
    val q = queries.select(col(idCol).as("query_id"),
        centeredEncode(col(vecCol), cb).as("q_code"))
      .withColumn("qna", codeDot(col("q_code"), col("q_code")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        centeredEncode(col(vecCol), cb).as("c_code"))
      .withColumn("qnb", codeDot(col("c_code"), col("c_code")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qdot", codeDot(col("q_code"), col("c_code")))
      .withColumn("qcos",
        when(col("qna") === 0 || col("qnb") === 0, lit(0.0))
          .otherwise(col("qdot").cast("double") /
            sqrt(col("qna").cast("double") * col("qnb").cast("double"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("qdot"),
        graft.functions.StableRound.tieStableRound(col("qcos"), 6).as("qcos"))
  }
}
