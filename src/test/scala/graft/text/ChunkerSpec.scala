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
}
