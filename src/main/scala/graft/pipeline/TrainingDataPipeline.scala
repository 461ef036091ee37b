package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.dedup.{Components, Dedup}

/** The composed training-data curation pipeline — the end-to-end shape a
  * 100 TB corpus run takes, built from the operator modules:
  *
  *   score (lang-ID, quality, token counts)
  *     → filter (quality floor, language allowlist)
  *     → exact dedup (fingerprint groupBy)
  *     → near-dup clustering (MinHash-LSH pairs → connected components)
  *     → canonical survivors with per-stage counters.
  *
  * Each stage is one shuffle-bounded DataFrame transform; nothing collects
  * to the driver except the final counters.
  */
object TrainingDataPipeline {

  final case class CurationStats(
      input: Long, afterQualityFilter: Long, afterExactDedup: Long,
      afterNearDedup: Long)

  final case class Curated(docs: DataFrame, stats: CurationStats)

  def curate(documents: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             minQuality: Double = 0.2,
             allowedLangs: Option[Seq[String]] = None,
             nearDupJaccard: Double = 0.5,
             shingleN: Int = 3): Curated = {
    val input = documents.count()

    // 1. score + filter
    val scored = documents
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .withColumn("detected_lang", TextOps.langId(col(textCol)))
      .withColumn("n_tokens", TextOps.tokenCount(col(textCol)))
    val filtered0 = scored.filter(col("quality") >= minQuality)
    val filtered = allowedLangs match {
      case Some(ls) => filtered0.filter(col("detected_lang").isin(ls: _*))
      case None => filtered0
    }
    val afterQuality = filtered.count()

    // 2. exact dedup: keep min id per fingerprint
    val withFp = filtered.withColumn("_fp", TextOps.fingerprint(col(textCol)))
    val keepIds = withFp.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    val exactDeduped = withFp.join(keepIds, Seq("_fp", idCol), "left_semi").drop("_fp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val afterExact = exactDeduped.count()

    // 3. near-dup clustering: LSH candidates filtered by estimated jaccard,
    //    components, keep canonical member only
    val pairs = Dedup.minhashLshCandidates(exactDeduped, idCol, textCol, shingleN)
      .filter(col("estimated_jaccard") >= nearDupJaccard)
    val decisions = Components.canonicalize(
      exactDeduped.select(col(idCol).cast("long").as("id")), pairs)
    val survivors = exactDeduped.join(
      decisions.filter(!col("is_duplicate")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    val afterNear = survivors.count()

    Curated(survivors, CurationStats(input, afterQuality, afterExact, afterNear))
  }
}
