package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "science physics experiment result", true),
    (2L, "science theory proof physics", true),
    (3L, "celebrity gossip fashion party", false),
    (4L, "physics experiment gossip", false),
    (5L, "fashion party celebrity gossip party", false))
    .toDF("doc_id", "text", "tgt")

  test("target-like raw documents score above target-unlike ones") {
    val scores = Dsir.importance(docs, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // doc 4 shares 'physics experiment' with the target; doc 5 shares nothing
    assert(scores(4L) > scores(5L))
    // in-target docs score positive, anti-target docs negative
    assert(scores(1L) > 0 && scores(2L) > 0)
    assert(scores(3L) < 0 && scores(5L) < 0)
  }

  test("micro-nat scores are exact integers independent of partitioning") {
    val one = Dsir.importance(docs.coalesce(1), "doc_id", "text", col("tgt"))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    val many = Dsir.importance(docs.repartition(7), "doc_id", "text", col("tgt"))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(one == many)
  }

  test("n_terms counts tokens per document") {
    val n = Dsir.importance(docs, "doc_id", "text", col("tgt"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(n(1L) == 4L && n(5L) == 5L)
  }
}
