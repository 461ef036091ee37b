package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class GapFillSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("forward-fills gaps on each key's own hourly span") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00"), Some(5.0)),
      (1L, 11L, ts("2024-01-01 03:20:00"), Some(7.0)),
      (2L, 20L, ts("2024-01-01 01:00:00"), Some(9.0)),
      (2L, 21L, ts("2024-01-01 01:30:00"), None) // null value: not an observation
    ).toDF("user_id", "event_id", "ts", "value")
    val out = GapFill.hourlyFfill(events, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getAs[Long]("key"), r.getAs[Timestamp]("hour").toString,
        r.getAs[Double]("value"), r.getAs[Boolean]("observed"))).toSet
    assert(out == Set(
      (1L, "2024-01-01 00:00:00.0", 5.0, true),
      (1L, "2024-01-01 01:00:00.0", 5.0, false), // gap filled
      (1L, "2024-01-01 02:00:00.0", 5.0, false),
      (1L, "2024-01-01 03:00:00.0", 7.0, true),
      (2L, "2024-01-01 01:00:00.0", 9.0, true))) // key 2's span is one hour
  }

  test("latest observation in a bucket wins, ties broken by id") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:05:00"), Some(1.0)),
      (1L, 2L, ts("2024-01-01 00:45:00"), Some(2.0)),
      (1L, 3L, ts("2024-01-01 00:45:00"), Some(3.0)) // same ts, higher id wins
    ).toDF("user_id", "event_id", "ts", "value")
    val out = GapFill.hourlyFfill(events, "user_id", "ts", "value", "event_id").collect()
    assert(out.length == 1 && out.head.getAs[Double]("value") == 3.0)
  }
}
