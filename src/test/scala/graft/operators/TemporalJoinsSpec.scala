package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05")),
    (2L, "A", ts("2024-01-01 10:00:30")),
    (3L, "B", ts("2024-01-01 10:00:10")),
    (4L, "C", ts("2024-01-01 10:00:10"))
  ).toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:00:05"), 101.0), // tie with trade 1 → inclusive
    ("A", ts("2024-01-01 10:00:29"), 102.0),
    ("A", ts("2024-01-01 10:00:31"), 999.0), // after trade 2 → never matched
    ("B", ts("2024-01-01 10:00:20"), 50.0)   // after trade 3 → no match
  ).toDF("sym", "qt", "px")

  test("as-of backward: latest quote at-or-before each trade; ties inclusive") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> Some(101.0), 2L -> Some(102.0), 3L -> None, 4L -> None))
  }

  test("as-of backward with tolerance: stale matches are nulled") {
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "t", "qt", Seq("px"),
        toleranceMicros = Some(500000L)) // 0.5 s
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    // trade 1 matches the tied 10:00:05 quote (gap 0); trade 2's nearest
    // quote is 1 s stale → nulled
    assert(out === Map(1L -> Some(101.0), 2L -> None, 3L -> None, 4L -> None))
  }

  test("as-of right ties broken by greatest tieBreak column") {
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 10:00:05"), 1L, 11.0),
      ("A", ts("2024-01-01 10:00:05"), 2L, 22.0)
    ).toDF("sym", "qt", "seq", "px")
    val out = AsofJoin.backward(trades.filter($"trade_id" === 1), dupQuotes,
        Seq("sym"), "t", "qt", Seq("px"), tieBreak = Some("seq"))
      .select("px").as[Double].collect()
    assert(out.toSeq === Seq(22.0))
  }

  test("range join pairsPreceding: (t-span, t] window, cross-bucket matches included") {
    val spanUs = 10L * 1000000L // 10 s
    val out = RangeJoin.pairsPreceding(
        trades, quotes.withColumnRenamed("px", "qpx"),
        Seq("sym"), "t", "qt", spanUs, Seq("qpx"))
      .groupBy("trade_id").agg(sort_array(collect_list("qpx")).as("pxs"))
      .as[(Long, Seq[Double])].collect().toMap
    // trade 1 (10:00:05): quotes at 10:00:00 (crosses a bucket boundary
    // backwards) and the tied 10:00:05 → inclusive upper bound
    assert(out(1L) === Seq(100.0, 101.0))
    // trade 2 (10:00:30): only 10:00:29 within (10:00:20, 10:00:30]
    assert(out(2L) === Seq(102.0))
    // trade 3 (B, 10:00:10): B's quote is later → absent (inner semantics)
    assert(!out.contains(3L))
  }

  test("as-of plans one shuffle partitioned by key — no per-key cartesian") {
    val plan = AsofJoin.backward(trades, quotes, Seq("sym"), "t", "qt", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
