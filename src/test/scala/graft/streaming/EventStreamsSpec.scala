package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {

  private lazy val eventsDir = {
    // bounded parquet dir that readStream can tail
    val dir = java.nio.file.Files.createTempDirectory("events_stream").toString
    graft.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed streaming agg matches the batch aggregation") {
    val schema = graft.Tables.events(spark, sf).schema
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val result = EventStreams.runToMemory(spark,
      EventStreams.windowedCounts(stream), "windowed_counts", OutputMode.Append())
    val batch = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // append mode emits only closed windows (watermark passed); every
    // emitted row must match its batch twin
    val emitted = result.select(col("window.start").as("ws"), col("event_type"), col("n"))
    val expected = batch.select(col("window.start").as("ws"), col("event_type"), col("n"))
    assert(emitted.count() > 0)
    assert(emitted.join(expected, Seq("ws", "event_type", "n"), "left_anti").count() == 0)
  }

  test("streaming sessionize: gap splits sessions, totals correct") {
    import spark.implicits._
    def ev(id: Long, tMs: Long, user: Long, v: Double) =
      EventStreams.Event(id, new java.sql.Timestamp(tMs), user, "click", v)
    val events = Seq(
      ev(1, 1000, 1, 1.0), ev(2, 2000, 1, 2.0),       // session A
      ev(3, 100000, 1, 5.0),                          // session B (97s gap)
      ev(4, 1500, 2, 7.0)                             // user 2, still open
    ).toDS()
    // bounded batch through the streaming fold: only closed sessions emit
    val sessions = EventStreams.sessionize(events, gapMs = 10000)
      .collect().map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(sessions == Set((1L, 2L, 3.0)))
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.Event]
    val deduped = EventStreams.dedupStream(input.toDF(), "10 minutes", Seq("event_id"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    def ev(id: Long, tMs: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(tMs), 1L, "click", 1.0)
    input.addData(ev(1, 1000), ev(2, 2000), ev(1, 1000)) // in-batch duplicate
    q.processAllAvailable()
    input.addData(ev(2, 2500), ev(3, 3000)) // cross-batch re-delivery
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join matches the batch range join") {
    val schema = graft.Tables.events(spark, sf).schema
    def src(streaming: Boolean) =
      if (streaming) spark.readStream.schema(schema).parquet(eventsDir)
      else graft.Tables.events(spark, sf)
    def purchases(streaming: Boolean) = src(streaming)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    def clicks(streaming: Boolean) = src(streaming)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"), col("ts").as("cts"))

    val joined = EventStreams.intervalJoinStream(
      purchases(true), clicks(true), key = "user_id",
      leftTs = "ts", rightTs = "cts", spanSeconds = 3600, watermark = "10 minutes")
    val got = EventStreams.runToMemory(spark, joined, "interval_join")
      .select("p_id", "c_id")

    val expected = graft.operators.RangeJoin.pairsPreceding(
      purchases(false), clicks(false), Seq("user_id"),
      "ts", "cts", 3600L * 1000000L, Seq("c_id"))
      .select("p_id", "c_id")

    // bounded input + processAllAvailable → the stream emits the complete
    // inner-join result, which must equal the batch range join exactly
    assert(got.count() === expected.count())
    assert(got.join(expected, Seq("p_id", "c_id"), "left_anti").count() === 0)
    assert(expected.join(got, Seq("p_id", "c_id"), "left_anti").count() === 0)
  }

  test("batch sessionize twin: all sessions incl. open ones") {
    import spark.implicits._
    val df = Seq(
      (1L, new java.sql.Timestamp(1000), 1L, "click", 1.0),
      (2L, new java.sql.Timestamp(2000), 1L, "click", 2.0),
      (3L, new java.sql.Timestamp(100000), 1L, "click", 5.0),
      (4L, new java.sql.Timestamp(1500), 2L, "click", 7.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.sessionizeBatch(df, gapMs = 10000)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    assert(out == Set((1L, 2L, 3.0), (1L, 1L, 5.0), (2L, 1L, 7.0)))
  }
}
