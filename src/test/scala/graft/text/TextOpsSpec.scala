package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).head().get(0)
  }

  test("token count: whitespace, blank, multi-space") {
    assert(one(TextOps.tokenCount(col("text")), "a b  c") == 3)
    assert(one(TextOps.tokenCount(col("text")), "   ") == 0)
    assert(one(TextOps.tokenCount(col("text")), "") == 0)
    assert(one(TextOps.tokenCount(col("text")), "single") == 1)
  }

  test("bpe-ish count: words, digits, punctuation each count") {
    // "don't stop 42!" → don,',t,stop,4,2,! = 7
    assert(one(TextOps.bpeishTokenCount(col("text")), "don't stop 42!") == 7)
  }

  test("langid picks the profile with most stopword hits") {
    assert(one(TextOps.langId(col("text")), "the cat sat on the mat and it is happy") == "en")
    assert(one(TextOps.langId(col("text")), "el gato es un animal y la casa es grande") == "es")
    assert(one(TextOps.langId(col("text")), "der hund ist ein tier und das haus") == "de")
    assert(one(TextOps.langId(col("text")), "xyzzy plugh qwerty") == "und")
  }

  test("fingerprint is whitespace/punctuation/case insensitive") {
    val a = one(TextOps.fingerprint(col("text")), "Hello,   World!")
    val b = one(TextOps.fingerprint(col("text")), "hello world")
    val c = one(TextOps.fingerprint(col("text")), "hello worlds")
    assert(a == b && a != c)
  }

  test("shingles: sliding word n-grams") {
    import spark.implicits._
    val sh = Seq("a b c d").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("s")).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("quality score in [0,1] and monotone in stopword richness") {
    val junk = one(TextOps.qualityScore(col("text")), "!!! ??? ###").asInstanceOf[Double]
    val good = one(TextOps.qualityScore(col("text")),
      ("the quick brown fox jumps over the lazy dog and it is a fine day " * 4)).asInstanceOf[Double]
    assert(junk >= 0.0 && junk <= 1.0 && good >= 0.0 && good <= 1.0)
    assert(good > junk)
  }
}
