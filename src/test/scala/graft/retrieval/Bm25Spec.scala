package graft.retrieval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple apple apple apple"),
    (4L, "durian fig grape")).toDF("doc_id", "text")

  test("term frequencies follow the shared tokenizer contract") {
    val tf = Bm25.termFreqs(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(tf.contains((1L, "apple", 2L)))
    assert(tf.contains((3L, "apple", 4L)))
    assert(tf.contains((2L, "cherry", 1L)))
  }

  test("bm25 ranks higher-tf docs first but saturates by length") {
    val queries = Seq((0, "apple")).toDF("query_id", "word")
    val top = Bm25.topK(docs, "doc_id", "text", queries, k = 10)
      .orderBy($"rank").as[(Int, Long, Int, Double)].collect()
    // only docs containing 'apple' appear
    assert(top.map(_._2).toSet == Set(1L, 3L))
    // doc 3 (tf=4) outranks doc 1 (tf=2): same idf, higher saturated tf
    assert(top.head._2 == 3L && top.head._3 == 1)
    assert(top.forall(_._4 > 0.0))
  }

  test("a rare term outscores a common term at equal tf") {
    // 'cherry' (df=1) beats 'banana' (df=2) on the same doc 2
    val queries = Seq((0, "cherry"), (1, "banana")).toDF("query_id", "word")
    val scores = Bm25.topK(docs, "doc_id", "text", queries, k = 10)
      .filter($"doc_id" === 2L)
      .select($"query_id", $"score").as[(Int, Double)].collect().toMap
    assert(scores(0) > scores(1))
  }

  test("two-term query sums per-term contributions") {
    val single = Seq((0, "apple")).toDF("query_id", "word")
    val both = Seq((0, "apple"), (0, "banana")).toDF("query_id", "word")
    def score(q: org.apache.spark.sql.DataFrame): Double =
      Bm25.topK(docs, "doc_id", "text", q, k = 10)
        .filter($"doc_id" === 1L).select($"score").as[Double].head()
    assert(score(both) > score(single))
  }
}
