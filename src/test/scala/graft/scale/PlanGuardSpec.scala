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

  test("oracle queries and oracle SQL keys line up") {
    val qs = graft.SparkEntry.queries.keySet
    val os = graft.SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
  }
}
