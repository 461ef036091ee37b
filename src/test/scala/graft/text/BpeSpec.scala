package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge is greedy left-to-right and non-overlapping") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "a"), Seq("b"))
      .toDF("toks")
    val out = df.select(Bpe.applyMerge(col("toks"), "a", "a").as("m"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("aa", "a"))
    assert(out(1) == Seq("a", "b", "aa"))
    assert(out(2) == Seq("b"))
  }

  test("learnMerges finds the most frequent pair first, ties by symbol") {
    // 'ab' appears in both words (counts 3+2=5); 'bc' only in the second (2)
    val docs = Seq("ab ab ab abc abc").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 2)
      .orderBy($"step").as[(Int, String, String, Long)].collect()
    assert(merges(0) == ((1, "a", "b", 5L)))
    // after merging 'ab', the top pair is ('ab','c') with count 2
    assert(merges(1) == ((2, "ab", "c", 2L)))
  }

  test("learnMerges stops when no pairs remain") {
    val docs = Seq("a b c a b").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", nMerges = 10)
    // single-char words only → no adjacent pairs at all
    assert(merges.count() == 0)
  }

  test("learnMerges is independent of partitioning") {
    val docs = (1 to 50).map(i => s"alpha beta gamma delta word$i")
      .toDF("text")
    val one = Bpe.learnMerges(docs.coalesce(1), "text", 5)
      .as[(Int, String, String, Long)].collect().toSeq
    val many = Bpe.learnMerges(docs.repartition(8), "text", 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(one == many && one.size == 5)
  }

  test("tokenize applies learned merges in training order") {
    val docs = Seq("banana banana band").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 3)
      .orderBy($"step").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    val toks = Seq("banana").toDF("w")
      .select(Bpe.tokenize(col("w"), merges).as("t"))
      .as[Seq[String]].head()
    // whatever the learned merges are, re-tokenizing a training word
    // yields fused symbols that concatenate back to the word
    assert(toks.mkString == "banana" && toks.size < 6)
  }
}
