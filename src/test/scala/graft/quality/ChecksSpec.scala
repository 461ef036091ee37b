package graft.quality

import graft.SparkSpec
import Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some("a@x.com"), 5.0, "A"),
    (2L, Some("b@y.org"), 15.0, "B"),
    (3L, None, 25.0, "A"),
    (3L, Some("not-an-email"), -1.0, "C")
  ).toDF("id", "email", "score", "grade")

  private def results(checks: Seq[Check]): Map[String, (Double, Boolean)] =
    Checks.run(t, checks).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

  test("one aggregation pass evaluates all scalar check kinds") {
    val out = results(Seq(
      Completeness("email_filled", "email", minRatio = 0.9),
      Uniqueness("id_unique", Seq("id")),
      InRange("score_range", "score", 0.0, 30.0, minRatio = 1.0),
      PatternMatch("email_shape", "email", "^[^@]+@[^@]+\\.[a-z]+$", minRatio = 0.5)))
    assert(out("email_filled") == ((0.75, false)))   // 3/4 non-null, below 0.9
    assert(out("id_unique") == ((0.75, false)))      // id 3 repeats
    assert(out("score_range") == ((0.75, false)))    // -1.0 out of range
    assert(out("email_shape") == ((0.5, true)))      // 2 of 4 match
  }

  test("passing checks report passed with their metric as evidence") {
    val out = results(Seq(
      Completeness("id_filled", "id"),
      PatternMatch("grade_shape", "grade", "^[A-C]$")))
    assert(out("id_filled") == ((1.0, true)))
    assert(out("grade_shape") == ((1.0, true)))
  }

  test("a near-1 ratio that ROUNDS to 1.0 still fails a strict minRatio=1.0 gate") {
    // 4,000,000 clean rows + 1 null: exact completeness 0.99999975 rounds
    // to 1.0 at 6 digits — the reported metric says 1.0 but `passed` must
    // gate on the exact ratio and flag the violation
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val big = spark2.range(4000000)
      .select(col("id"), when(col("id") === 0, null).otherwise(col("id")).as("v"))
    val out = Checks.run(big, Seq(Completeness("v_filled", "v", minRatio = 1.0)))
      .collect().head
    assert(out.getDouble(1) == 1.0)      // rounded evidence
    assert(!out.getBoolean(2))           // exact gate catches the null row
  }

  test("containment measures the orphan ratio against a parent key set") {
    val parent = Seq(1L, 2L).toDF("pid")
    val out = results(Seq(
      Containment("ids_known", "id", parent, "pid", minRatio = 1.0)))
    assert(out("ids_known") == ((0.5, false))) // both id=3 rows are orphans
  }

  test("a duplicate-keyed parent does not inflate the containment ratio") {
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pid")
    val out = results(Seq(Containment("ids_known", "id", parent, "pid")))
    assert(out("ids_known")._1 == 0.5)
  }
}
