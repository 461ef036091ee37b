package graft

import org.apache.spark.sql.functions._
import graft.merge.MergeEngine

/** Capability-bar check (BASELINE.md): the reference must externally merge
  * >10M-entity sources inside a ≤32Gi envelope via its hand-rolled
  * DiskGraphMerger; here the same workload runs through the one
  * groupByKey+Aggregator path and Spark's sort-spill shuffle.
  *
  * Generates 2×N overlapping synthetic nodes (50% overlap, so 2N input
  * rows → 1.5N distinct ids, 0.5N property-merged) and reports wall time.
  * The default CLI run uses 6M per source (the reference's RESOURCE_HOGS
  * threshold neighborhood, orion/merging.py:240); Bench drives 25M per
  * source — 50M input rows, an order of magnitude past where the
  * reference forks to its disk merger — inside the same one-code-path
  * merge and the default 8 GiB driver heap (well under the reference's
  * 32-40 GiB helm envelope).
  * Usage: runMain graft.ScaleSmoke [nPerSourceMillions]
  */
object ScaleSmoke {

  final case class MergeSmokeResult(inputRows: Long, distinctIds: Long,
                                    mergedAway: Long, secs: Double)

  /** Merge 2×n overlapping synthetic node sources through the production
    * MergeEngine path; returns counts + wall seconds. Callable from Bench
    * so the round artifact carries the envelope evidence. */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long): MergeSmokeResult = {
    // Shuffle-partition count rides the input size (the dedup curve's r13
    // fix, and the knob a real deployment turns): at the session's fixed
    // 32 partitions the merge aggregate buffers 50M/32 ≈ 1.6M
    // (ordinal, json) entries per task — far over the per-task execution
    // memory at the 8 GiB/32-thread bench envelope — and the round-15
    // baseline artifact recorded 17.2 GB memory / 2.9 GB disk spill
    // (`smoke_detail.merge`). ~200k rows/partition keeps the per-task
    // buffer ~40 MB so the object-hash aggregate stays in memory.
    // restored in the finally: Bench gives each smoke a throwaway session,
    // but any other caller's session must not silently keep the scaled count
    val priorPartitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.max(32L, 2 * n / 200000L).toString)
    try {
      def source(offset: Long, tag: String) =
        spark.range(n).select(
          concat(lit("NODE:"), col("id") + offset).as("id"),
          concat(lit("Node "), col("id") + offset).as("name"),
          array(lit("biolink:NamedThing")).as("category"),
          array(concat(lit(tag), col("id") % 1000)).as("synonyms"))

      // 50% overlap between the two sources
      val a = source(0, "a")
      val b = source(n / 2, "b")
      val unioned = MergeEngine.withOrdinal(Seq(a, b))
        .reduce(_.unionByName(_, allowMissingColumns = true))

      val t0 = System.nanoTime()
      val merged = MergeEngine.mergeNodes(unioned)
      val stats = merged.agg(count(lit(1)).as("n"), sum("nMerged").as("merged")).head()
      val secs = (System.nanoTime() - t0) / 1e9
      MergeSmokeResult(2 * n, stats.getLong(0), stats.getLong(1), secs)
    } finally spark.conf.set("spark.sql.shuffle.partitions", priorPartitions)
  }

  def main(args: Array[String]): Unit = {
    val nMill = if (args.nonEmpty) args(0).toInt else 6
    val n = nMill * 1000000L
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val r = run(spark, n)
    println(f"[scale-smoke] input=${r.inputRows} distinct=${r.distinctIds} " +
      f"merged=${r.mergedAway} wall=${r.secs}%.1f s " +
      f"heap=${Runtime.getRuntime.maxMemory() / (1L << 30)} GiB")
    spark.stop()
  }
}
