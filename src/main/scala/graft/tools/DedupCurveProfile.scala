package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Attributes a dedup smoke's cost: runs the chosen engine's smoke at
  * the given sizes with a stage-metrics listener and prints, per stage,
  * wall time, task time, shuffle read/write and spill — so a superlinear
  * point or a pin breach reads as "stage X spills" instead of a guess.
  * Usage:
  *   runMain graft.tools.DedupCurveProfile [minhash|winnow|substring] [nMillions...]
  * (default engine minhash, default sizes 4 and 8 — the last two curve
  * points; per-stage ratios between two runs localize superlinearity.
  * `substring 1 1 1` gives the bench substring smoke's min-of-3 with
  * per-stage attribution — the smoke whose driver-host runs breached
  * their pin four rounds running with quiet CPU probes.)
  */
object DedupCurveProfile {

  final case class StageAgg(name: String, var wallMs: Long = 0L,
      var taskTimeMs: Long = 0L, var cpuTimeNs: Long = 0L,
      var shuffleReadMB: Long = 0L,
      var shuffleWriteMB: Long = 0L, var spillMemMB: Long = 0L,
      var spillDiskMB: Long = 0L, var tasks: Int = 0, var maxTaskMs: Long = 0L)

  private class MetricsListener extends SparkListener {
    val stages = mutable.LinkedHashMap[Int, StageAgg]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val agg = stages.getOrElseUpdate(si.stageId,
        StageAgg(si.name.linesIterator.next().take(90)))
      agg.wallMs += (for {
        s <- si.submissionTime; c <- si.completionTime
      } yield c - s).getOrElse(0L)
      val m = si.taskMetrics
      agg.taskTimeMs += m.executorRunTime
      agg.cpuTimeNs += m.executorCpuTime
      agg.shuffleReadMB += m.shuffleReadMetrics.totalBytesRead >> 20
      agg.shuffleWriteMB += m.shuffleWriteMetrics.bytesWritten >> 20
      agg.spillMemMB += m.memoryBytesSpilled >> 20
      agg.spillDiskMB += m.diskBytesSpilled >> 20
      agg.tasks += si.numTasks
    }
  }

  def main(args: Array[String]): Unit = {
    val engines: Map[String, (org.apache.spark.sql.SparkSession, Long) => (Double, Long, Long)] =
      Map("minhash" -> graft.DedupScaleSmoke.run,
        "winnow" -> graft.DedupScaleSmoke.runWinnowing,
        "substring" -> graft.DedupScaleSmoke.runSubstring)
    val (engine, sizeArgs) = args.toSeq match {
      case e +: rest if engines.contains(e) => (e, rest)
      case other => ("minhash", other)
    }
    val sizes = (sizeArgs match {
      case Seq() => Seq(4.0, 8.0)
      case xs => xs.map(_.toDouble)
    }).map(m => (m * 1e6).toLong)
    sizes.foreach { n =>
      val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .newSession()
      val listener = new MetricsListener
      spark.sparkContext.addSparkListener(listener)
      val (secs, dups, expected) = engines(engine)(spark, n)
      spark.sparkContext.removeSparkListener(listener)
      println(f"%n=== $engine smoke n=$n wall=$secs%.1f s dups=$dups/$expected ===")
      println(f"${"stage"}%-92s ${"wall_s"}%8s ${"task_s"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spillM"}%8s ${"spillD"}%8s ${"tasks"}%6s")
      listener.stages.values.toSeq.sortBy(-_.taskTimeMs).take(18).foreach { a =>
        println(f"${a.name}%-92s ${a.wallMs / 1000.0}%8.1f ${a.taskTimeMs / 1000.0}%8.1f " +
          f"${a.shuffleReadMB}%8d ${a.shuffleWriteMB}%8d ${a.spillMemMB}%8d ${a.spillDiskMB}%8d ${a.tasks}%6d")
      }
      val tot = listener.stages.values
      println(f"TOTAL task_s=${tot.map(_.taskTimeMs).sum / 1000.0}%.1f " +
        f"task_cpu_s=${tot.map(_.cpuTimeNs).sum / 1e9}%.1f " +
        f"shuffle_read_MB=${tot.map(_.shuffleReadMB).sum} " +
        f"shuffle_write_MB=${tot.map(_.shuffleWriteMB).sum} " +
        f"spill_disk_MB=${tot.map(_.spillDiskMB).sum}")
    }
  }
}
