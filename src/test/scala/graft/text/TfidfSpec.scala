package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple apple banana"),
    (2L, "apple cherry!"),
    (3L, "Cherry,cherry; date"),
    (4L, ""),
  ).toDF("doc_id", "text")

  test("words normalizes case and punctuation, drops empties") {
    val w = docs.select(col("doc_id"), Tfidf.words(col("text")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(w(1L) == Seq("apple", "apple", "banana"))
    assert(w(2L) == Seq("apple", "cherry"))
    assert(w(3L) == Seq("cherry", "cherry", "date"))
    assert(w(4L) == Seq())
  }

  test("topTerms computes tf, df, and tf*ln(N/df) with deterministic ranking") {
    val top = Tfidf.topTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getDouble(5)))
    val byDoc = top.groupBy(_._1)
    // doc 1: apple tf=2 df=2 → 2·ln(2); banana tf=1 df=1 → ln(4)
    val d1 = byDoc(1L).sortBy(_._5)
    assert(d1.map(_._2).toSeq == Seq("apple", "banana"))
    assert(math.abs(d1(0)._6 - 2 * math.log(2)) < 1e-5)
    assert(math.abs(d1(1)._6 - math.log(4)) < 1e-5)
    // doc 3: cherry tf=2 df=2 ranks over date tf=1 df=1 (2ln2 > ln4 — tie
    // on value? 2ln2 = ln4 exactly! rank falls to word order: cherry < date)
    val d3 = byDoc(3L).sortBy(_._5)
    assert(d3.map(_._2).toSeq == Seq("cherry", "date"))
    // empty doc contributes no rows
    assert(!byDoc.contains(4L))
  }

  test("rank never exceeds k and scores are monotone within a doc") {
    val top = Tfidf.topTerms(graft.Tables.documents(spark, sf), "doc_id", "text", k = 3)
    assert(top.filter(col("rank") > 3).count() == 0)
    val bad = top.alias("a").join(top.alias("b"),
        expr("a.doc_id = b.doc_id AND a.rank < b.rank AND a.score < b.score"))
    assert(bad.count() == 0)
  }
}
