package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import graft.merge.{GraphMerger, MergeEngine}
import graft.normalize.Normalizer

/** Per-source ingest pipeline + graph build orchestration (SURVEY §2.9
  * O1-O3, §3.1-§3.2). Reference: orion/ingest_pipeline.py:54-105 (stage
  * state machine), orion/graph_pipeline.py:50-414 (build + dependency
  * resolution), orion/metadata.py:8-14 (statuses).
  *
  * Driver-side Scala: deterministic, no Spark needed for the control plane.
  * Stage results are memoized in a `<source>.meta.json` sidecar under a
  * content-versioned directory scheme, so re-runs skip stable stages —
  * the reference's build-cache property.
  */
object IngestPipeline {

  sealed trait StageStatus { def name: String }
  case object NotStarted extends StageStatus { val name = "not_started" }
  case object Stable extends StageStatus { val name = "stable" }
  case object InProgress extends StageStatus { val name = "in_progress" }
  case object Broken extends StageStatus { val name = "broken" }
  case object Failed extends StageStatus { val name = "failed" }

  private val mapper = new ObjectMapper()

  /** A pluggable source: how to fetch+parse one upstream into (nodes,
    * edges). In production `parse` reads downloaded artifacts; in tests it
    * reads fixtures. */
  trait SourceLoader {
    def sourceId: String
    def sourceVersion: String = "fixture"
    def parsingVersion: String = "1.0"
    def parse(spark: SparkSession): (DataFrame, DataFrame)
    /** Normalization maps for this source (fixture-backed by default —
      * SURVEY §7.1: hermetic normalizer). */
    def nodeNormMap(spark: SparkSession): Option[DataFrame] = None
    def predicateNormMap(spark: SparkSession): Option[DataFrame] = None
    def strictNormalization: Boolean = true
    def removeUnconnected: Boolean = true
  }

  final case class StageResult(stage: String, status: String, detail: String)
  final case class IngestResult(sourceId: String, buildVersion: String,
                                nodes: DataFrame, edges: DataFrame,
                                stages: Seq[StageResult])

  private def writeMeta(dir: String, sourceId: String, buildVersion: String,
                        stages: Seq[StageResult]): Unit = {
    val meta = mapper.createObjectNode()
    meta.put("source_id", sourceId)
    meta.put("build_version", buildVersion)
    val arr = meta.putArray("stages")
    stages.foreach { s =>
      val o = arr.addObject()
      o.put("stage", s.stage); o.put("status", s.status); o.put("detail", s.detail)
    }
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(dir, s"$sourceId.meta.json"), meta.toPrettyString)
  }

  /** O1 — run one source through parse → normalize → (QC counts), writing
    * the stage memo sidecar. Normalization is applied only when the loader
    * provides maps (pre-normalized sources skip, like the reference's
    * *_pre_normalized flags). */
  def runSource(spark: SparkSession, loader: SourceLoader,
                storageDir: String): IngestResult = {
    val stages = scala.collection.mutable.ArrayBuffer[StageResult]()
    val (rawNodes, rawEdges) = loader.parse(spark)
    stages += StageResult("parsing", Stable.name,
      s"nodes=${rawNodes.count()} edges=${rawEdges.count()}")

    val (nodes, edges, normVersion) = loader.nodeNormMap(spark) match {
      case Some(nm) =>
        val pm = loader.predicateNormMap(spark)
          .getOrElse(Normalizer.predicateMapDf(spark, Nil))
        val (nNodes, nodeStats) = Normalizer.normalizeNodes(rawNodes, nm, loader.strictNormalization)
        val (nEdges, edgeStats) = Normalizer.normalizeEdges(rawEdges, nm, pm,
          s"infores:${loader.sourceId.toLowerCase}")
        val finalNodes =
          if (loader.removeUnconnected) GraphMerger.removeUnconnectedNodes(nNodes, nEdges)
          else nNodes
        stages += StageResult("normalization", Stable.name,
          s"nodes=${nodeStats.postNorm} failures=${nodeStats.failures} " +
          s"edges=${edgeStats.normalizedEdges} splits=${edgeStats.edgeSplits} " +
          s"failed_edges=${edgeStats.edgesFailedDueToNodes} loops=${edgeStats.subclassLoopsRemoved}")
        (finalNodes, nEdges, "1.0")
      case None =>
        stages += StageResult("normalization", Stable.name, "pre-normalized")
        (rawNodes, rawEdges, "none")
    }

    val buildVersion = Versioning.sourceBuildVersion(
      loader.sourceId, loader.sourceVersion, loader.parsingVersion, normVersion)
    writeMeta(storageDir, loader.sourceId, buildVersion, stages.toSeq)
    IngestResult(loader.sourceId, buildVersion, nodes, edges, stages.toSeq)
  }

  /** O2 — build a graph from a spec: run every source, group by merge
    * strategy, merge, finalize the bundle. */
  def buildGraph(spark: SparkSession, spec: GraphSpec,
                 loaders: Map[String, SourceLoader],
                 outDir: String): GraphBundle.BundleResult = {
    val ingested = spec.sources.map { s =>
      val loader = loaders.getOrElse(s.id,
        throw new IllegalArgumentException(s"no loader for source ${s.id}"))
      s -> runSource(spark, loader, s"$outDir/sources")
    }
    def graphs(strategy: String) = ingested.collect {
      case (s, r) if s.mergeStrategy == strategy =>
        GraphMerger.SourceGraph(r.sourceId, r.nodes, r.edges, s.mergeStrategy)
    }
    val counters = Some(MergeEngine.counters(spark))
    val merged = GraphMerger.mergeGraph(
      primary = graphs("default"),
      secondary = graphs("connected_edge_subset"),
      dontMerge = graphs("dont_merge"),
      edgeMergingAttributes = spec.edgeMergingAttributes,
      counters = counters)
    GraphBundle.finalizeBundle(spec, merged.nodes, merged.edges, outDir)
  }
}
