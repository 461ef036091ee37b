package graft.text

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {

  test("common-ngram fraction against hand-computed corpus counts") {
    import spark.implicits._
    // "a b" occurs 4x corpus-wide (>=3 -> common); every other bigram 1x
    val docs = Seq(
      (1L, "a b c"),       // bigrams: "a b"(4), "b c"(1) -> 1/2 common
      (2L, "a b a b"),     // "a b"(4), "b a"(1), "a b" -> 2/3... wait: a b, b a, a b = 3 bigrams, 2 common
      (3L, "a b x"),       // "a b", "b x" -> 1/2
      (4L, "z"),           // no bigram -> dropped
      (5L, "")             // empty -> dropped
    ).toDF("doc_id", "text")
    val out = CorpusStats.commonNgramFrac(docs, "doc_id", "text", 2, 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((2L, 0.5)))
    assert(out(2L) == ((3L, math.floor(2.0 / 3 * 10000 + 0.5) / 10000)))
    assert(out(3L) == ((2L, 0.5)))
    assert(!out.contains(4L) && !out.contains(5L))
  }
}
