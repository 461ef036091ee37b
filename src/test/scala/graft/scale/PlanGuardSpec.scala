package graft.scale

import graft.SparkSpec

/** Plan-shape regression guard over the whole query surface: every
  * SparkEntry query must plan, and none may degrade to an unbounded
  * CartesianProduct (the bounded similarity baselines use broadcast
  * nested-loop joins, which is the intended shape). */
class PlanGuardSpec extends SparkSpec {

  test("all queries plan without CartesianProduct") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("no single-partition window over non-aggregated input") {
    // The 100 TB window cliff: an unpartitioned WindowExec moves EVERY row
    // through one task. Allowed only when its input has already been
    // aggregated (e.g. PrefixSum's bucket totals, cardinality-bounded
    // meta rollups) — i.e. an Aggregate sits between the window and the scan.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    // Walk DOWN through single-child nodes only (project/sort/exchange):
    // the window's direct input must BE an aggregate. A collectFirst over
    // the whole subtree would also accept an aggregate on a join's far
    // branch (e.g. a broadcast scalar), wrongly blessing a full-input
    // global window above that join.
    @scala.annotation.tailrec
    def aggregateBelow(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true
      case u if u.children.size == 1 => aggregateBelow(u.children.head)
      case _ => false
    }
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // sparkPlan, not executedPlan: AQE's adaptive root hides children
        val bad = fn(spark, sf).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !aggregateBelow(w.child) => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"unpartitioned full-input windows in: $offenders")
  }

  test("oracle queries and oracle SQL keys line up") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
  }
}
