package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-smoke stage-metric totals for the bench artifact: every scale
  * smoke runs under a listener and lands a `smoke_detail` entry in
  * bench.json, so a slow point self-diagnoses from the artifact alone —
  * no re-run, no cross-referencing a separate profile tool.
  *
  * Why these fields: two clean same-code runs have disagreed 2× on a
  * curve point's WALL time with quiet boundary probes on both sides
  * (the round-14 dedup 8M point, 128.5 vs 264.9 s) — a single wall
  * sample near a pin cannot distinguish host steal from a regression.
  * `task_cpu_s` (executor CPU, not wall) is steal-invariant: a real
  * regression raises it, CPU steal stretches wall while leaving it
  * flat. `spill_disk_mb`/`spill_mem_mb` attribute memory-ceiling
  * superlinearity (the pre-r14 8M tail), `gc_s` heap pressure, and the
  * shuffle volumes pin the data shape itself, which must be identical
  * across same-code runs.
  */
object SmokeMetrics {

  final case class Totals(taskWallS: Double, taskCpuS: Double, gcS: Double,
      shuffleReadMB: Long, shuffleWriteMB: Long,
      spillMemMB: Long, spillDiskMB: Long) {
    def json: String =
      f"""{"task_wall_s":$taskWallS%.1f,"task_cpu_s":$taskCpuS%.1f,"gc_s":$gcS%.1f,""" +
        s""""shuffle_read_mb":$shuffleReadMB,"shuffle_write_mb":$shuffleWriteMB,""" +
        s""""spill_mem_mb":$spillMemMB,"spill_disk_mb":$spillDiskMB}"""
  }

  private class TotalsListener extends SparkListener {
    var taskWallMs = 0L
    var taskCpuNs = 0L
    var gcMs = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    var spillMemB = 0L
    var spillDiskB = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      taskWallMs += m.executorRunTime
      taskCpuNs += m.executorCpuTime
      gcMs += m.jvmGCTime
      shuffleReadB += m.shuffleReadMetrics.totalBytesRead
      shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
      spillMemB += m.memoryBytesSpilled
      spillDiskB += m.diskBytesSpilled
    }
  }

  /** Runs `body` with a stage-metrics listener attached to `spark` and
    * returns (result, totals). Listener events are posted
    * asynchronously; the bus is drained before reading the totals so a
    * smoke's final stages aren't missed. */
  def measure[T](spark: SparkSession)(body: => T): (T, Totals) = {
    val l = new TotalsListener
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      // flush pending stage-completed events: the bus posts
      // asynchronously and its drain method is private[spark], so go
      // through reflection with a bounded-sleep fallback — an
      // undercounted total only makes the attribution weaker, never
      // wrong-signed
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
          .invoke(bus, java.lang.Long.valueOf(30000L))
      } catch { case _: Throwable => Thread.sleep(1000L) }
      (r, Totals(l.taskWallMs / 1e3, l.taskCpuNs / 1e9, l.gcMs / 1e3,
        l.shuffleReadB >> 20, l.shuffleWriteB >> 20,
        l.spillMemB >> 20, l.spillDiskB >> 20))
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
