package graft

import org.apache.spark.sql.functions._
import graft.merge.MergeEngine

/** Capability-bar check (BASELINE.md): the reference must externally merge
  * >10M-entity sources inside a ≤32Gi envelope via its hand-rolled
  * DiskGraphMerger; here the same workload runs through the one
  * groupByKey+Aggregator path and Spark's sort-spill shuffle.
  *
  * Generates 2×6M overlapping synthetic nodes (12M input rows → 9M
  * distinct ids, 3M property-merged) and reports wall time.
  * Usage: runMain graft.ScaleSmoke [nPerSourceMillions]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nMill = if (args.nonEmpty) args(0).toInt else 6
    val n = nMill * 1000000L
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

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
    println(f"[scale-smoke] input=${2 * n} distinct=${stats.getLong(0)} " +
      f"merged=${stats.getLong(1)} wall=${secs}%.1f s " +
      f"heap=${Runtime.getRuntime.maxMemory() / (1L << 30)} GiB")
    spark.stop()
  }
}
