package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events table shape.
  * The reference is batch-only; these are the streaming twins of its
  * aggregation plane, plus stateful sessionization — the pattern a
  * training-data ingest pipeline needs for continuous event feeds.
  *
  * Scale: watermarks bound state; the windowed agg is a streaming hash
  * aggregate partitioned by (window, event_type); sessionization state is
  * per-user and expires on event-time timeout.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long, total_value: Double,
                           started: java.sql.Timestamp, ended: java.sql.Timestamp)

  private final case class SessionState(n: Long, total: Double,
                                        startMs: Long, endMs: Long)

  /** Windowed aggregation with watermark: 5-minute tumbling windows per
    * event type (the streaming twin of q11_hourly_rollup). */
  def windowedCounts(events: DataFrame,
                     watermark: String = "10 minutes",
                     window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))

  /** Stateful sessionization via flatMapGroupsWithState: events are folded
    * into per-user session state; sessions close after `gapMs` of event-time
    * inactivity (gap detected within the sorted batch; timed-out state in
    * continuous mode closes on the processing-time timeout). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def fold(userId: Long, rows: Iterator[Event],
             state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val closed = scala.collection.mutable.ArrayBuffer[Session]()
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs <= gapMs =>
            cur = Some(s.copy(n = s.n + 1, total = s.total + e.value, endMs = t))
          case Some(s) =>
            closed += Session(userId, s.n, math.round(s.total * 100) / 100.0,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs))
            cur = Some(SessionState(1, e.value, t, t))
          case None =>
            cur = Some(SessionState(1, e.value, t, t))
        }
      }
      cur match {
        case Some(s) if state.hasTimedOut =>
          state.remove()
          closed += Session(userId, s.n, math.round(s.total * 100) / 100.0,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs))
        case Some(s) =>
          state.update(s)
          state.setTimeoutDuration(gapMs)
        case None => ()
      }
      closed.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(fold)
  }

  /** Batch twin of sessionize for bounded data (oracle-checkable): sessions
    * from gap detection via lag() — same output as the streaming fold. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("_prev"))) > gapMs * 1000L, 1).otherwise(0))
      .withColumn("_session_no", sum(col("_new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("_session_no"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        min(col("ts")).as("started"), max(col("ts")).as("ended"))
      .drop("_session_no")
  }

  /** Streaming ingest dedup: drop events whose `keyCols` repeat within
    * the watermark horizon (`dropDuplicatesWithinWatermark`) — the
    * continuous twin of the dedup plane's exact pass, for feeds where
    * retries/replays re-deliver rows. State is bounded by the watermark:
    * a key's fingerprint ages out once event time passes `watermark`
    * beyond it, so state size tracks the horizon's key cardinality, not
    * the stream's. */
  def dedupStream(events: DataFrame, watermark: String,
                  keyCols: Seq[String], tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: left rows pair with right rows sharing
    * `key` whose `rightTs` falls in `(leftTs - span, leftTs]` — the
    * streaming twin of [[graft.operators.RangeJoin]]. Both sides carry
    * watermarks, so Spark bounds the join state: a buffered right row is
    * evicted once the left watermark passes `rightTs + span` (the range
    * condition gives the planner the eviction bound — an unconstrained
    * stream-stream join would buffer forever). Column names must be
    * disjoint apart from `key`. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String, spanSeconds: Long,
                         watermark: String): DataFrame =
    left.withWatermark(leftTs, watermark).alias("l")
      .join(right.withWatermark(rightTs, watermark).alias("r"),
        expr(s"l.$key = r.$key" +
          s" AND r.$rightTs > l.$leftTs - INTERVAL $spanSeconds SECONDS" +
          s" AND r.$rightTs <= l.$leftTs"))
      .drop(col(s"r.$key"))

  /** Batch replay helper: run a streaming query over a bounded parquet dir
    * through the memory sink and return the result table (used by tests and
    * by Verify-style offline checks). */
  def runToMemory(spark: SparkSession, streamingDf: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = streamingDf.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
