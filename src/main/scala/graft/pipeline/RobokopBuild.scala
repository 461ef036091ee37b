package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.derive.DerivedGraphs
import graft.io.GraphCsvSink
import graft.parsers.Registry

/** A composed "robokop-style" multi-source build, mirroring the shape of
  * the reference's robokop graph spec (graph_specs/robokop-graph-spec.yaml)
  * on checked-in fixtures: N real parsers → per-source ingest → merge →
  * derived artifacts (redundant + collapsed-qualifier KGs) → Neo4j and
  * Memgraph CSV exports. One entry point so the benchmark can time the
  * whole lifecycle a reference user runs with `orion-build robokop`.
  */
object RobokopBuild {

  /** (source id, fixture subdirectory) pairs — real registered parsers. */
  val sources: Seq[(String, String)] = Seq(
    "HGNC" -> "hgnc",
    "GOA" -> "goa",
    "CTD" -> "ctd",
    "UbergraphNonredundant" -> "ubergraph",
    "ClinGenGeneDiseaseValidity" -> "clingen",
    "EHRMayTreatKP" -> "ehr",
    "MGIGenePhenotypes" -> "mgi",
    "STRING-DB-Human" -> "string")

  final case class BuildCounts(nodes: Long, edges: Long,
                               redundant: Long, collapsed: Long)

  private class FixtureLoader(val sourceId: String, dir: String)
      extends IngestPipeline.SourceLoader {
    override def parse(spark: SparkSession): (DataFrame, DataFrame) = {
      val g = Registry(sourceId)(spark, dir)
      (g.nodes, g.edges)
    }
    override def nodeNormMapDefined: Boolean = false
  }

  /** `sourceOrder` defaults to the canonical list; the determinism spec
    * passes a shuffled permutation and asserts the merged bundle digests
    * are identical — source order must never leak into the output. */
  def run(spark: SparkSession, fixturesDir: String, outDir: String,
          sourceOrder: Seq[(String, String)] = sources): BuildCounts = {
    val spec = GraphSpec(
      graphId = "RobokopStyle",
      graphName = "robokop-style fixture build",
      sources = sourceOrder.map { case (id, _) => GraphSource(id) })
    val loaders: Map[String, IngestPipeline.SourceLoader] = sourceOrder.map {
      case (id, sub) => id -> (new FixtureLoader(id, s"$fixturesDir/$sub"): IngestPipeline.SourceLoader)
    }.toMap

    val bundle = IngestPipeline.buildGraph(spark, spec, loaders, outDir)

    val mergedNodes = spark.read.json(s"$outDir/nodes.jsonl")
    val mergedEdges = spark.read.json(s"$outDir/edges.jsonl")

    val redundant = DerivedGraphs.redundantEdges(mergedEdges)
    val collapsed = DerivedGraphs.collapsedQualifierEdges(mergedEdges)
    val redundantCount = redundant.count()
    val collapsedCount = collapsed.count()

    GraphCsvSink.writeNeo4jNodes(mergedNodes, s"$outDir/neo4j-nodes")
    GraphCsvSink.writeNeo4jEdges(mergedEdges, s"$outDir/neo4j-edges")
    GraphCsvSink.writeMemgraphEdges(mergedEdges, s"$outDir/memgraph-edges")

    BuildCounts(bundle.nodeCount, bundle.edgeCount, redundantCount, collapsedCount)
  }
}
