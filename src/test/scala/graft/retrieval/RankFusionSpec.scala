package graft.retrieval

import graft.SparkSpec

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  test("items ranked well by both backends fuse above single-list items") {
    val a = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("query_id", "item", "rank")
    val b = Seq((0L, 11L, 1), (0L, 13L, 2), (0L, 10L, 3))
      .toDF("query_id", "item", "rank")
    val fused = RankFusion.rrf2(a, b, "item", k = 10)
      .orderBy($"fused_rank")
      .as[(Long, Long, Double, Int)].collect()
    // 11: 1/62 + 1/61; 10: 1/61 + 1/63 — both-backend items lead
    assert(fused.take(2).map(_._2).toSet == Set(10L, 11L))
    assert(fused.head._2 == 11L)
    // single-list items still appear with one contribution
    assert(fused.map(_._2).toSet == Set(10L, 11L, 12L, 13L))
    // rrf scores decrease with fused_rank (ties broken by item id)
    assert(fused.sliding(2).forall { case Array(x, y) => x._3 >= y._3 })
  }

  test("fusion is per query and honors k") {
    val a = (1 to 8).map(i => (0L, i.toLong, i)) ++
      (1 to 8).map(i => (1L, (100 + i).toLong, i))
    val b = (1 to 8).map(i => (0L, i.toLong, 9 - i)) ++
      (1 to 8).map(i => (1L, (100 + i).toLong, 9 - i))
    val fused = RankFusion.rrf2(
      a.toDF("query_id", "item", "rank"),
      b.toDF("query_id", "item", "rank"), "item", k = 3)
    assert(fused.count() == 6)
    assert(fused.filter($"query_id" === 1L).count() == 3)
  }
}
