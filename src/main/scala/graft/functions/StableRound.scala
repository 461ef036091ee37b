package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Tie-stable cross-engine rounding for oracle-compared double columns.
  *
  * Spark's `round()` converts the double to BigDecimal via its SHORTEST
  * decimal representation and applies HALF_UP to that string; DuckDB
  * rounds the raw binary double. A value whose shortest representation
  * lands exactly on a decimal tie (0.72625) but whose binary value sits
  * just below it rounds UP in Spark and DOWN in DuckDB — a data-dependent
  * 1-ulp landmine (hit for real by q31/q42 at sf0.1, round 7).
  *
  * floor(x·10^d + 0.5)/10^d is pure IEEE-754 arithmetic — identical in any
  * engine — so when both engines compute x bit-identically (ratios of
  * exact integers, sequential double dot products), the rounded output is
  * structurally identical too, not identical-by-luck. Use for every
  * oracle-compared double DERIVED FROM EXACT INPUTS; double SUMS stay on
  * round() since their inputs already differ across engines in the last
  * bits (addition order) and no rounding formula can fix that.
  */
object StableRound {
  def tieStableRound(c: Column, digits: Int): Column = {
    val k = math.pow(10, digits)
    floor(c * k + 0.5) / k
  }

  /** The SQL twin, for DuckDB oracle strings. */
  def sql(expr: String, digits: Int): String = {
    val k = math.pow(10, digits).toLong
    s"floor(($expr) * $k + 0.5) / $k"
  }
}
