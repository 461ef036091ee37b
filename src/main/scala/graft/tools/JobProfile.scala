package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: run named queries and print every Spark job each launches
  * (duration + call site), so a multi-action query's time is attributable
  * to its internal passes.
  * Usage: runMain graft.tools.JobProfile <name>... [-sf <dir>]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfIdx = args.indexOf("-sf")
    if (sfIdx >= 0 && sfIdx + 1 >= args.length) {
      System.err.println("usage: runMain graft.tools.JobProfile <name>... [-sf <dir>]")
      sys.exit(2)
    }
    val sfDir = if (sfIdx >= 0) args(sfIdx + 1) else "/root/testdata/sf0.1"
    val names = (if (sfIdx >= 0) args.patch(sfIdx, Nil, 2) else args).toSeq
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    names.foreach(profile(spark, _, sfDir))
    spark.stop()
  }

  private def profile(spark: org.apache.spark.sql.SparkSession,
                      name: String, sfDir: String): Unit = {
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm-up
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n').take(60)))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    println(f"[jobprofile] $name: $total%.3f s total, $n rows, ${all.size} jobs")
    all.foreach { case (id, sec, site) => println(f"[jobprofile]   job $id%3d  $sec%7.3f s  $site") }
    val bySite = all.groupBy(_._3).view.mapValues(v => (v.size, v.map(_._2).sum)).toSeq
      .sortBy(-_._2._2)
    println("[jobprofile] by call site:")
    bySite.foreach { case (site, (cnt, sec)) => println(f"[jobprofile]   $sec%7.3f s  $cnt%3d jobs  $site") }
  }
}
