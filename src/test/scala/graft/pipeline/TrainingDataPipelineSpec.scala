package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingDataPipelineSpec extends SparkSpec {

  test("curate: score → filter → exact dedup → near-dup clusters") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and it is a fine day in the old country"
    val docs = Seq(
      (0L, base),                       // survivor (canonical of near-dup cluster)
      (1L, base + " indeed"),           // near-dup of 0 → dropped
      (2L, base),                       // exact dup of 0 → dropped
      (3L, "!!! ### ???"),              // junk → quality filtered
      (4L, "a completely different document with the usual quality of words that it is made of")
    ).toDF("doc_id", "text")

    val out = TrainingDataPipeline.curate(docs, minQuality = 0.2, nearDupJaccard = 0.5,
      computeStats = true)
    val stats = out.stats.get
    assert(stats.input == 5)
    assert(stats.afterQualityFilter == 4)  // junk removed
    assert(stats.afterExactDedup == 3)     // id 2 removed
    assert(stats.afterNearDedup == 2)      // id 1 removed
    val survivors = out.docs.select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 4L))
    // scoring columns present on the output
    assert(out.docs.columns.toSet.intersect(
      Set("quality", "detected_lang", "n_tokens")).size == 3)
  }

  test("curate on the synthetic corpus keeps most docs (no pathological drop)") {
    val docs = graft.Tables.documents(spark, sf)
    val out = TrainingDataPipeline.curate(docs, minQuality = 0.1, nearDupJaccard = 0.9,
      computeStats = true)
    val stats = out.stats.get
    assert(stats.input == 500)
    assert(stats.afterNearDedup > 400) // word-soup corpus: few 0.9-dups
    assert(stats.afterNearDedup <= stats.afterExactDedup)
  }
}
