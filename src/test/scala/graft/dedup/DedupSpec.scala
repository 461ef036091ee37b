package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  /** Corpus with a planted near-dup pair (0,1), an exact dup pair (2,3),
    * and unrelated docs. */
  private lazy val docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills of the old country"
    Seq(
      (0L, base),
      (1L, base + " today"), // near-dup of 0
      (2L, "identical content for exact duplicate detection in this corpus"),
      (3L, "identical content for exact duplicate detection in this corpus"),
      (4L, "completely different words about spark query engines and distributed shuffles and partitions"),
      (5L, "yet another unrelated document mentioning embeddings vectors similarity and nearest neighbors")
    ).toDF("doc_id", "text")
  }

  test("incremental exact dedup flags batch docs already in the index") {
    import spark.implicits._
    val index = Seq((10L, "Seen Before!"), (11L, "seen before"), (12L, "only in index"))
      .toDF("doc_id", "text")
    val batch = Seq((20L, "seen  BEFORE"), (21L, "brand new content"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExact(index, batch, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("dup_of")), r.getAs[Boolean]("is_dup"))).toMap
    assert(out(20L) == ((Some(10L), true))) // smallest matching index id wins
    assert(out(21L) == ((None, false)))
    assert(out.size == 2) // index rows never appear in the output
  }

  test("incremental near-dup flags batch docs fuzzily matching the index") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills"
    val index = Seq((10L, base), (11L, base), (12L, "only in the index nothing like the batch documents at all"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, base + " today"), // near-dup of 10 AND 11 → smallest id wins
      (21L, "brand new content nothing shares any shingle with the corpus here"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(index, batch, "doc_id", "text",
        shingleN = 3, bands = 32, rowsPerBand = 2, tau = 0.8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dup_of"), r.getAs[Double]("jaccard")))).toMap
    assert(out.keySet == Set(20L))          // only actual near-dups surface
    assert(out(20L)._1 == 10L)              // deterministic representative
    assert(out(20L)._2 >= 0.8)
    // index-index near-dups (10, 11) must NOT appear: no corpus self-join
  }

  test("near-dup batch/index id collision: batch text wins, no duplicated pair rows") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills"
    // id 10 exists on BOTH sides with different text (a re-ingest): the
    // verifier universe must keep exactly one row per id — the batch one —
    // so candidate pairs join a single doc row, not two
    val index = Seq(
      (10L, "stale version of this document totally unlike anything in the batch corpus"),
      (11L, base)).toDF("doc_id", "text")
    val batch = Seq((10L, base + " today")).toDF("doc_id", "text")
    val rows = Dedup.incrementalNearDup(index, batch, "doc_id", "text",
        shingleN = 3, bands = 32, rowsPerBand = 2, tau = 0.8).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("doc_id") == 10L)
    assert(rows.head.getAs[Long]("dup_of") == 11L)   // the batch text matched 11
    assert(rows.head.getAs[Double]("jaccard") >= 0.8) // not diluted by the stale row
  }

  test("near-dup id collision with band-colliding sub-tau texts emits no self-pair") {
    import spark.implicits._
    // id 10 on both sides: the stale index text shares enough shingles
    // with the batch text to band-collide at 32×2 (j ≈ 0.6 → collision
    // prob ≈ 1), but the true similarity is below tau = 0.8. Without the
    // self-pair filter the candidate (10,10) verifies the batch text
    // against itself (jaccard 1.0) and reports dup_of = 10 — a false
    // positive. With it, the output is empty.
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the green hills"
    val index = Seq(
      (10L, base + " under a grey sky near the river bend at dawn")).toDF("doc_id", "text")
    val batch = Seq((10L, base)).toDF("doc_id", "text")
    val rows = Dedup.incrementalNearDup(index, batch, "doc_id", "text",
        shingleN = 3, bands = 32, rowsPerBand = 2, tau = 0.8).collect()
    assert(rows.isEmpty)
  }

  test("exact dedup groups identical normalized content") {
    val out = Dedup.exact(docs, "text", "doc_id").filter(col("n_copies") > 1).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("canonical_id") == 2L)
    assert(out.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash LSH finds planted near-dup and exact pairs, skips unrelated") {
    val pairs = Dedup.minhashLshCandidates(docs, "doc_id", "text", shingleN = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("estimated_jaccard"))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    assert(keys.contains((2L, 3L)))
    assert(!keys.contains((4L, 5L)))
    val exact = pairs.find(p => (p._1, p._2) == ((2L, 3L))).get
    assert(exact._3 == 1.0)
  }

  test("ngram jaccard: exact value for the exact pair, high for near pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, minJaccard = 0.3, dfCap = 100)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((2L, 3L)) == 1.0)
    assert(pairs((0L, 1L)) > 0.8) // one extra trailing token
    assert(!pairs.contains((4L, 5L)))
  }

  test("simhash: hamming 0 for identical, small for near, large for unrelated") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(2L), h(3L)) == 0)
    assert(hamming(h(0L), h(1L)) < 12)
    assert(hamming(h(4L), h(5L)) > 12)
  }

  test("simhash candidates include identical pair with hamming 0") {
    val out = Dedup.simhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Number]("hamming").longValue()).toMap
    assert(out((2L, 3L)) == 0L)
  }

  test("winnowing fingerprints: subset of shingle hashes, window guarantee, determinism") {
    import graft.functions.{TextExpressions, WinnowingFingerprints, TextSketch}
    val rows = docs.select(col("doc_id"),
        TextExpressions.winnowingFingerprints(graft.text.TextOps.tokens(col("text")), 3, 4).as("fps"),
        graft.functions.TextExpressions.distinctShingleHashes(
          graft.text.TextOps.tokens(col("text")), 3).as("shingles"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toList
    rows.foreach { case (_, fps, shingles) =>
      assert(fps.nonEmpty) // every shingled doc yields >= 1 fingerprint
      assert(fps.toSet.subsetOf(shingles.toSet)) // fingerprints ARE shingle hashes
      assert(fps == fps.sorted && fps.distinct == fps)
      // density: winnowing keeps far fewer than all shingles on long docs
      if (shingles.length > 12) assert(fps.length < shingles.length)
    }
    // identical docs fingerprint identically
    val byId = rows.map(r => r._1 -> r._2).toMap
    assert(byId(2L) == byId(3L))
    // window-min guarantee on the raw array algorithm: every window of w
    // consecutive shingle hashes contains a selected fingerprint
    val sh = Array(9L, 7L, 8L, 3L, 5L, 6L, 2L, 4L)
    val fps = WinnowingFingerprints.winnow(sh, 3)
    assert(fps.toSeq == fps.toSeq.sorted)
    sh.sliding(3).foreach(wnd => assert(wnd.exists(fps.contains), wnd.toSeq))
    // rightmost-min tie-break: equal mins keep the later position's hash
    assert(WinnowingFingerprints.winnow(Array(5L, 5L, 5L), 2).toSeq == Seq(5L))
    assert(WinnowingFingerprints.winnow(Array.emptyLongArray, 4).isEmpty)
    // short stream (< w windows) collapses to the global min
    assert(WinnowingFingerprints.winnow(Array(4L, 2L, 9L), 5).toSeq == Seq(2L))
  }

  test("winnowing candidates find planted pairs, skip unrelated") {
    val keys = Dedup.winnowingCandidates(docs, "doc_id", "text", shingleN = 3, window = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(keys.contains((0L, 1L)))
    assert(keys.contains((2L, 3L)))
    assert(!keys.contains((4L, 5L)))
  }

  test("decontaminate flags corpus docs sharing an n-gram with the benchmark") {
    import spark.implicits._
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares the full 5-gram "alpha beta gamma delta epsilon" → flagged
      (0L, "prefix words alpha beta gamma delta epsilon suffix words"),
      // shares only a 4-token run → NOT flagged at shingleN=5
      (1L, "prefix alpha beta gamma delta other suffix trailing pad"),
      // no overlap
      (2L, "entirely unrelated content with no benchmark tokens at all"),
      // shares two distinct 5-grams with bench 101 → n_matched = 2
      (3L, "one two three four five six intervening one two three four five")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "doc_id", "text", shingleN = 5, window = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_matched")).toMap
    assert(out.keySet == Set(0L, 3L))
    assert(out(0L) == 1L)
    assert(out(3L) == 2L)
  }

  test("bloom-prefiltered decontamination is result-identical to exact") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text")
      .orderBy("id").collect()
    // a coarse sketch (10% fpp) stresses the false-positive kill path
    val bloom = Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", fpp = 0.1)
      .orderBy("id").collect()
    assert(exact.nonEmpty && bloom.sameElements(exact))
  }

  test("decontaminate window>1 sub-samples but keeps long shared runs") {
    import spark.implicits._
    val run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val bench = Seq((100L, run)).toDF("doc_id", "text")
    val corpus = Seq((0L, s"lead tokens $run tail tokens here")).toDF("doc_id", "text")
    // shared run of 12 tokens ≥ n+w-1 = 5+4-1 = 8 → guaranteed flagged
    val out = Dedup.decontaminate(corpus, bench, "doc_id", "text", shingleN = 5, window = 4)
    assert(out.count() == 1)
  }

  test("hot-shingle cap prevents stopword-shingle pair explosion") {
    import spark.implicits._
    // 30 docs sharing one hot shingle, otherwise distinct
    val hotDocs = (0 until 30).map(i => (i.toLong, s"common shared shingle unique$i word$i token$i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(hotDocs, "doc_id", "text",
      shingleN = 3, minJaccard = 0.01, dfCap = 10)
    assert(pairs.count() == 0) // the only shared shingle is hot → dropped
  }

  test("containment: pasted sub-document scores ~1 directionally, low jaccard") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta"
    val big = s"intro words here $small and then many completely different trailing tokens " +
      "padding the larger document with unrelated content about engines"
    val pair = Seq((10L, small), (11L, big)).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(pair, "doc_id", "text",
      shingleN = 3, minContainment = 0.5, dfCap = 100)
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (a, b, ab, ba) = out.head
    assert(a == 10L && b == 11L)
    assert(ab == 1.0)  // every shingle of the small doc appears in the big one
    assert(ba < 0.5)   // but the big doc is NOT contained in the small one
  }

  test("containment threshold keeps a pair when only one direction clears") {
    import spark.implicits._
    val pair = Seq(
      (20L, "one two three four five"),
      (21L, "one two three four five six seven eight nine ten eleven twelve thirteen")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(pair, "doc_id", "text",
      shingleN = 3, minContainment = 0.9, dfCap = 100).collect()
    assert(out.length == 1) // cont_ab = 1.0 clears, cont_ba ≈ 0.27 does not
  }
}
