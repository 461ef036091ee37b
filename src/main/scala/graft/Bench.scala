package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  * Each query runs twice — the first pass absorbs JVM/codegen/page-cache
  * warm-up (one shared session, like a long-lived cluster app), the second
  * is the reported steady-state time. Output: one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm-up: codegen + shuffle files + page cache
        // cross-query hygiene: drop the previous query's cache entries and
        // let the ContextCleaner release orphaned checkpoint blocks, so a
        // query's timing isn't polluted by its neighbors' leftover state
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        (name, time(fn(spark, sfDir).count()), None: Option[String])
      } catch {
        case e: Throwable =>
          (name, -1.0, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ").take(200) + "\""
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a throwing query must fail loud: its message lands in `errors` and the
    // headline total is poisoned to -1 so a regression can't shrink the number
    val errors = results.collect { case (k, _, Some(m)) => "\"" + k + "\":" + jstr(m) }
      .mkString("{", ",", "}")
    val total =
      if (results.exists(_._3.isDefined)) -1.0 else results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
