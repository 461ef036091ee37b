package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunks partition every document's tokens contiguously") {
    val docs = graft.Tables.documents(spark, sf)
    val chunks = Chunker.cdcChunks(docs, "doc_id", "text")
    val perDoc = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("chunk_toks"), count(lit(1)).as("n_chunks"),
        min("start_pos").as("first"))
    val tokCounts = docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("ntok"))
      .filter(length(trim(col("text"))) > 0)
    // token totals match and chunks start at position 0
    val bad = perDoc.join(tokCounts, "doc_id")
      .filter(col("chunk_toks") =!= col("ntok") || col("first") =!= 0)
    assert(bad.count() == 0)
    assert(chunks.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("content-defined boundaries are LOCAL: an edit far from a chunk leaves its digest alone") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val edited = "inserted words here " + base // edit at the very head
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Chunker.cdcChunks(docs, "doc_id", "text")
      .select(col("doc_id"), col("digest")).collect()
    val d1 = chunks.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val d2 = chunks.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    // everything after the first resynchronized boundary is digest-identical
    val shared = d1.intersect(d2)
    assert(shared.size >= d1.size - 2,
      s"expected all but ~2 chunks shared, got ${shared.size} of ${d1.size}")
    // a fixed-size chunker (every 16 tokens) would share ZERO digests here
  }

  test("empty documents yield no chunks") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "a b c")).toDF("doc_id", "text")
    val byDoc = Chunker.cdcChunks(docs, "doc_id", "text")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(byDoc == Set(3L))
  }

  private def sliding(text: String, size: Int, stride: Int) =
    Chunker.slidingChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", size, stride)
      .as[(Long, Long, Long, String, String)].collect().toSeq.sortBy(_._2)

  test("sliding: windows overlap by size minus stride and the tail is short") {
    // 7 tokens, size 4, stride 3 → starts 0, 3, 6
    assert(sliding("t0 t1 t2 t3 t4 t5 t6", 4, 3) === Seq(
      (1L, 0L, 4L, "t0", "t3"),
      (1L, 1L, 4L, "t3", "t6"),
      (1L, 2L, 1L, "t6", "t6")))
  }

  test("sliding: an exact multiple leaves no dangling start") {
    // 6 tokens, size 3, stride 3 → starts 0, 3 only
    assert(sliding("a b c d e f", 3, 3).map(_._2) === Seq(0L, 1L))
  }

  test("sliding: blank documents yield no chunks") {
    assert(sliding("   ", 4, 2).isEmpty)
  }

  test("sliding: stride wider than size is rejected") {
    intercept[IllegalArgumentException] {
      Chunker.slidingChunks(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", size = 2, stride = 3)
    }
  }
}
