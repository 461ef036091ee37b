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

  final case class Curated(docs: DataFrame, stats: Option[CurationStats])

  /** @param computeStats when true, runs one extra `count()` per stage to
    *   fill [[CurationStats]]; the default keeps the hot path free of eager
    *   actions (same escape hatch as `Normalizer.computeStats`). */
  def curate(documents: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             minQuality: Double = 0.2,
             allowedLangs: Option[Seq[String]] = None,
             nearDupJaccard: Double = 0.5,
             shingleN: Int = 3,
             computeStats: Boolean = false,
             nearDup: Boolean = true): Curated = {

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

    // 2. exact dedup: keep min id per fingerprint. Materialized once
    //    (eager, lineage cut, blocks auto-released) — LSH banding, the
    //    component join and the final semi-join all re-enter this set.
    val withFp = filtered.withColumn("_fp", TextOps.fingerprint(col(textCol)))
    val keepIds = withFp.groupBy(col("_fp")).agg(min(col(idCol)).as(idCol))
    val exactDeduped = withFp.join(keepIds, Seq("_fp", idCol), "left_semi").drop("_fp")
      .localCheckpoint()

    // 3. near-dup clustering: LSH candidates filtered by estimated jaccard,
    //    components, keep canonical member only (skipped when nearDup=false
    //    — the oracle-checkable configuration, SQL can't express minhash)
    val survivors =
      if (!nearDup) exactDeduped
      else {
        val pairs = Dedup.minhashLshCandidates(exactDeduped, idCol, textCol, shingleN)
          .filter(col("estimated_jaccard") >= nearDupJaccard)
        val decisions = Components.canonicalize(
          exactDeduped.select(col(idCol).cast("long").as("id")), pairs)
        exactDeduped.join(
          decisions.filter(!col("is_duplicate")).select(col("id").as(idCol)),
          Seq(idCol), "left_semi")
      }

    val stats =
      if (!computeStats) None
      else Some(CurationStats(documents.count(), filtered.count(),
        exactDeduped.count(), survivors.count()))
    Curated(survivors, stats)
  }
}
