package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated by any other —
  * `r` dominates `q` when r.minimize ≤ q.minimize AND r.maximize ≥
  * q.maximize with at least one strict (Börzsönyi, Kossmann, Stocker —
  * ICDE 2001, the original skyline-operator paper).
  *
  * The block-nested-loop formulation is O(n²); the 2-D case collapses to
  * a cummax scan: a row survives iff its `maximize` strictly exceeds the
  * best `maximize` of every strictly-cheaper `minimize` value, and ties
  * its exact-minimize peers' best. As a Spark plan that is one map-side-
  * combined groupBy to the per-minimize-value maxima, a running max over
  * that (much smaller) group table, and an equi-join back — no
  * all-pairs, no explosion; at 100 TB the groupBy shuffle is the only
  * cost, and because skyline is DISTRIBUTIVE (skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B))) the frontier can be pre-reduced
  * per partition when even the group table is large (it is typically
  * tiny).
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier of (minimize ↓, maximize ↑),
    * independently per `partition` group. An empty `partition` computes
    * the global frontier through a single-partition window — legitimate
    * only when the distinct-minimize space is modest; at scale,
    * partition (or pre-reduce via the distributivity above).
    *
    * "Strictly smaller minimize" cannot be a RANGE window frame (a
    * numeric frame offset like −1 means value−1, not previous value, and
    * on doubles that silently widens the frame), so the scan runs over
    * the per-minimize-value group maxima: group → running max over
    * strictly-preceding groups (rows frame on the grouped rows) → join
    * the tiny group table back. A row survives iff it has the best
    * `maximize` of its exact-minimize peers (a strictly better peer
    * dominates; exact ties all survive) AND beats every cheaper group's
    * best. */
  def frontier(df: DataFrame, partition: Seq[String],
               minimize: String, maximize: String): DataFrame = {
    val pcols = partition.map(col)
    val groups = df.groupBy((pcols :+ col(minimize)): _*)
      .agg(max(col(maximize)).as("__peer"))
    val wLt = Window.partitionBy(pcols: _*).orderBy(col(minimize))
      .rowsBetween(Window.unboundedPreceding, -1)
    val best = groups.withColumn("__best", max(col("__peer")).over(wLt))
    df.join(best, partition :+ minimize)
      .filter((col("__best").isNull || col(maximize) > col("__best")) &&
        col(maximize) === col("__peer"))
      .drop("__peer", "__best")
  }
}
