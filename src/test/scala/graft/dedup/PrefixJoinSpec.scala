package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),   // near-dup of 1
    (3L, "one two three four five six seven"),
    (4L, "one two three four five six eight"),    // near-dup of 3
    (5L, "totally different words entirely here now"),
    (6L, "")                                      // unshingleable
  ).toDF("doc_id", "text")

  private def pairs(tau: Double): Set[(Long, Long)] =
    PrefixJoin.selfJoin(docs, "doc_id", "text", shingleN = 3, tau = tau)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("finds exactly the pairs at/above tau — matches brute-force truth") {
    // brute-force exact jaccard over the same shingle definition
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.3, dfCap = Int.MaxValue)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(0.3) == truth)
    assert(truth == Set((1L, 2L), (3L, 4L)))
  }

  test("tau = 1.0 keeps only identical shingle sets") {
    val d = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c x")).toDF("doc_id", "text")
    val got = PrefixJoin.selfJoin(d, "doc_id", "text", shingleN = 3, tau = 1.0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("jaccard values match the shared verifier's rounding contract") {
    val j = PrefixJoin.selfJoin(docs, "doc_id", "text", shingleN = 3, tau = 0.3)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("jaccard").head().getDouble(0)
    // docs 1/2: 4 shingles each, 3 shared → 3/5
    assert(j == 0.6)
  }

  test("a corpus-wide hot shingle does not blow up the candidate set") {
    // 40 docs all sharing one hot trigram prefix-wise would pair 780×;
    // rarest-first ordering keeps the hot shingle out of every prefix
    val hot = (1L to 40L).map(i => (i, s"common shared trigram unique$i tail$i end$i"))
      .toDF("doc_id", "text")
    val got = PrefixJoin.selfJoin(hot, "doc_id", "text", shingleN = 3, tau = 0.6)
    assert(got.count() == 0) // no pair actually reaches 0.6
  }
}
