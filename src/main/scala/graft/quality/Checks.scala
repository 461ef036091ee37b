package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableRound

/** Declarative data-quality constraint suite (the Deequ/Great-
  * Expectations shape, re-expressed Spark-first): a list of typed checks
  * compiles into ONE map-combined aggregation pass over the table —
  * completeness, uniqueness, range conformance, and pattern conformance
  * all ride the same scan — plus one narrow join per referential
  * (containment) check. Each check yields (check_name, metric, passed):
  * the metric is the measured ratio (tie-stably rounded so engines
  * agree bit-for-bit), `passed` compares it against the declared
  * minimum. A failing check therefore carries its evidence with it.
  *
  * Scale: the scalar block is a single aggregate with no shuffle before
  * the final 1-row reduce; uniqueness adds a count-distinct (Spark
  * plans a partial-distinct pre-aggregation); containment shuffles only
  * the child key against the deduplicated parent key set — AQE
  * broadcasts small parents. Nothing is per-check-per-scan: 10 checks
  * cost one pass, not ten.
  */
object Checks {

  sealed trait Check { def name: String }
  /** Non-null ratio of `column` ≥ minRatio. */
  final case class Completeness(name: String, column: String,
                                minRatio: Double = 1.0) extends Check
  /** Distinct ratio of the composite key ≥ minRatio (1.0 = unique). */
  final case class Uniqueness(name: String, columns: Seq[String],
                              minRatio: Double = 1.0) extends Check
  /** Ratio of rows with lo ≤ column ≤ hi (nulls fail) ≥ minRatio. */
  final case class InRange(name: String, column: String, lo: Double, hi: Double,
                           minRatio: Double = 1.0) extends Check
  /** Ratio of rows whose column matches `regex` ≥ minRatio. */
  final case class PatternMatch(name: String, column: String, regex: String,
                                minRatio: Double = 1.0) extends Check
  /** Referential containment: ratio of child rows whose `column` exists
    * in `parent(parentColumn)` ≥ minRatio. */
  final case class Containment(name: String, column: String, parent: DataFrame,
                               parentColumn: String, minRatio: Double = 1.0) extends Check

  /** Evaluate `checks` against `df` → (check_name, metric, passed),
    * ordered by check_name. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    val n = count(lit(1)).cast("double")
    val scalarChecks = checks.collect {
      case c: Completeness =>
        (c.name, count(col(c.column)).cast("double") / n, c.minRatio)
      case c: Uniqueness =>
        (c.name, count_distinct(col(c.columns.head),
          c.columns.tail.map(col): _*).cast("double") / n, c.minRatio)
      case c: InRange =>
        (c.name, count(when(col(c.column) >= c.lo && col(c.column) <= c.hi, 1))
          .cast("double") / n, c.minRatio)
      case c: PatternMatch =>
        (c.name, count(when(col(c.column).rlike(c.regex), 1))
          .cast("double") / n, c.minRatio)
    }
    val scalarRows: Option[DataFrame] =
      if (scalarChecks.isEmpty) None
      else Some {
        val agg = df.agg(scalarChecks.head._2.as("m0"),
          scalarChecks.tail.zipWithIndex.map { case ((_, m, _), i) =>
            m.as(s"m${i + 1}") }: _*)
        agg.select(explode(array(scalarChecks.zipWithIndex.map {
          case ((name, _, minRatio), i) =>
            struct(lit(name).as("check_name"),
              StableRound.tieStableRound(col(s"m$i"), 6).as("metric"),
              // `passed` gates on the EXACT ratio: rounding first would let
              // a 0.9999995 completeness (≈5 bad rows per 10M) round to 1.0
              // and slip past a strict minRatio=1.0 gate — the violation the
              // check exists to catch. Only the REPORTED metric is rounded
              // (for cross-engine bit-stability of the artifact).
              (col(s"m$i") >= lit(minRatio)).as("passed"))
        }: _*)).as("r")).select(col("r.*"))
      }
    val containmentRows = checks.collect { case c: Containment =>
      val parentKeys = c.parent.select(col(c.parentColumn).as("_pk")).distinct()
      df.select(col(c.column).as("_ck"))
        .join(parentKeys, col("_ck") === col("_pk"), "left")
        .agg((count(col("_pk")).cast("double") / n).as("m"))
        .select(lit(c.name).as("check_name"),
          StableRound.tieStableRound(col("m"), 6).as("metric"),
          (col("m") >= lit(c.minRatio)).as("passed")) // exact-ratio gate, see above
    }
    (scalarRows.toSeq ++ containmentRows)
      .reduce(_.unionByName(_))
      .orderBy(col("check_name"))
  }
}
