package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("no-op versions are compacted; validity windows chain per key") {
    val recs = Seq(
      (1L, ts(1), "A", 10.0),
      (1L, ts(5), "B", 10.0),  // status change → new version
      (1L, ts(9), "B", 10.0),  // no-op echo → compacted away
      (1L, ts(12), "B", 20.0), // price change → new version
      (2L, ts(3), "A", 5.0)    // single-version key stays current
    ).toDF("k", "eff", "status", "price")
    val out = Scd2.history(recs, "k", "eff", Seq("status", "price"))
      .select("k", "eff", "status", "price", "valid_to", "is_current")
      .as[(Long, Timestamp, String, Double, Option[Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    assert(out.map(r => (r._1, r._2, r._3, r._4)) === Seq(
      (1L, ts(1), "A", 10.0), (1L, ts(5), "B", 10.0), (1L, ts(12), "B", 20.0),
      (2L, ts(3), "A", 5.0)))
    // valid_to of each closed version equals the successor's valid_from
    assert(out.map(_._5) === Seq(Some(ts(5)), Some(ts(12)), None, None))
    assert(out.map(_._6) === Seq(false, false, true, true))
  }

  test("null attributes are tracked null-safely") {
    val recs = Seq(
      (1L, ts(1), None),            // all-null first version must survive
      (1L, ts(2), None),            // null → null: no change, compacted
      (1L, ts(3), Some("v")),       // null → value: change
      (1L, ts(4), None)             // value → null: change
    ).toDF("k", "eff", "attr")
    val out = Scd2.history(recs, "k", "eff", Seq("attr"))
      .select("eff").as[Timestamp].collect().sorted((x: Timestamp, y: Timestamp) => x.compareTo(y))
    assert(out.toSeq === Seq(ts(1), ts(3), ts(4)))
  }
}
