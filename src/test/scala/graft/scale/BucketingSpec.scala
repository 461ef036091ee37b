package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-path checks: bucketed co-located joins (the 100 TB answer to the
  * reference's repeated node-id joins) and broadcast-join plan shape. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, sf)
    val o = graft.Tables.orders(spark, sf)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).count()
    // disable broadcast so the join strategy choice is bucketing's to win
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the only Exchange allowed is the post-join aggregation shuffle —
      // neither join input may reshuffle
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed left side must not reshuffle")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed right side must not reshuffle")
      assert(joined.count() == 5)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val li = graft.Tables.lineitem(spark, sf)
    val p = graft.Tables.part(spark, sf)
    val joined = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("salted join matches plain join results (skew guard correctness)") {
    val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey")).groupBy("o_orderpriority").count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", salt = 8)
      .groupBy("o_orderpriority").count()
    val p = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == q)
  }

  test("salted count matches plain count") {
    val e = graft.Tables.events(spark, sf)
    val plain = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(e, "event_type", salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }

  test("parquet scans prune columns and push filters") {
    val li = graft.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val scan = li.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
  }
}
