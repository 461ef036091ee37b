package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Components, Dedup}

/** Scale smoke for the training-data dedup stack: generates a synthetic
  * corpus of N million documents where every 10th document is a mutated
  * near-duplicate of its predecessor and every 20th an exact duplicate,
  * then runs the full near-dup path — codegen minhash signatures → banded
  * LSH candidates → connected components → canonical picks — and reports
  * wall time + cluster stats.
  *
  * This is the shape that must survive 100 TB: the only row-scale
  * shuffles are the narrow (band, bucket, id) explode and the (id_a,
  * id_b) pair contraction; document text never shuffles.
  *
  * Usage: runMain graft.DedupScaleSmoke [nMillions]
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nMill = if (args.nonEmpty) args(0).toDouble else 1.0
    val n = (nMill * 1000000L).toLong
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val (secs, dups, expectedDups) = run(spark, n)
    println(f"[dedup-scale-smoke] docs=$n dups_found=$dups " +
      f"(expected=$expectedDups) wall=$secs%.1f s " +
      f"heap=${Runtime.getRuntime.maxMemory() / (1L << 30)} GiB")
    spark.stop()
  }

  /** Runs the full near-dup path over n synthetic docs; returns
    * (wall seconds, duplicates found, duplicates expected). Callable from
    * Bench so the round artifact carries a fixed-scale dedup throughput. */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long): (Double, Long, Long) = {
    // deterministic word-soup text: 30 tokens drawn from a base id so that
    // doc 10k+1 shares ~90% of tokens with doc 10k (near-dup) and doc
    // 20k+2 duplicates doc 20k exactly
    val base = spark.range(n).select(
      col("id"),
      when(col("id") % 20 === 2, col("id") - 2)
        .otherwise(when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))).as("base_id"),
      (col("id") % 10 === 1).as("is_near"))
    val docs = base.select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 30).map(i =>
          concat(lit(s"w$i"), pmod(xxhash64(col("base_id") + i), lit(5000)))) ++
        Seq(when(col("is_near"), concat(lit("extra"), col("id"))).otherwise(lit("common"))): _*)
        .as("text"))

    val t0 = System.nanoTime()
    val pairs = Dedup.minhashLshCandidates(docs, "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 4)
      .filter(col("estimated_jaccard") >= 0.5)
    val decisions = Components.canonicalize(
      docs.select(col("doc_id").cast("long").as("id")), pairs)
    val stats = decisions.agg(
      count(lit(1)).as("n"),
      sum(when(col("is_duplicate"), 1L).otherwise(0L)).as("dups")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    val expectedDups = n / 10 + n / 20 // near-dups (every 10th) + exact dups (every 20th)
    (secs, stats.getLong(1), expectedDups)
  }
}
