package graft.text

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed add-one smoothed scores on a 3-doc corpus") {
    // corpus: "a b a b", "a b c", "c" (dropped — under 2 words)
    // bigrams: (a,b)×2 from doc1 + (a,b) doc2, (b,a) doc1, (b,c) doc2
    // contexts: c(a·)=3, c(b·)=2 ; vocab {a,b,c} → V=3
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c"))
      .toDF("id", "txt")
    val out = BigramLm.scoreDocs(docs, "id", "txt")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    def units(cab: Long, ca: Long): Long =
      math.floor((cab + 1.0) / (ca + 3.0) * 1e9 + 0.5).toLong
    val pAB = units(3, 3) // (a,b): 4/6
    val pBA = units(1, 2) // (b,a): 2/5
    val pBC = units(1, 2) // (b,c): 2/5

    assert(!out.contains(3L)) // single-word doc has no bigrams
    assert(out(1L)._1 == 3 && out(1L)._2 == 2 * pAB + pBA)
    assert(out(2L)._1 == 2 && out(2L)._2 == pAB + pBC)
    val s1 = math.floor(out(1L)._2.toDouble / (3.0 * 1e9) * 1e6 + 0.5) / 1e6
    assert(out(1L)._3 == s1)
  }

  test("uniform doc scores 1/(1+V/c) shape: repeated single bigram") {
    // "x y x y x y": bigrams (x,y)×3, (y,x)×2; V=2; c(x·)=3, c(y·)=2
    val out = BigramLm.scoreDocs(Seq((7L, "x y x y x y")).toDF("id", "txt"),
      "id", "txt").as[(Long, Long, Long, Double)].head()
    val u = 3L * math.floor(4.0 / 5.0 * 1e9 + 0.5).toLong +
      2L * math.floor(3.0 / 4.0 * 1e9 + 0.5).toLong
    assert(out._2 == 5 && out._3 == u)
  }
}
