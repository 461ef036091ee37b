package graft.pipeline

import org.apache.spark.sql.DataFrame
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.io.KgxIO
import graft.derive.MetaKg
import java.nio.file.{Files, Paths}

/** Bundle finalize (SURVEY §2.2 K5, §3.1 merge_and_finalize tail):
  * nodes/edges jsonl.gz + graph-metadata.json + qc-results.json +
  * schema.json sidecars (refs orion/kgx_bundle.py:14-56,
  * orion/graph_pipeline.py:445-532, orion/kgx_metadata.py:449-469).
  * Sidecars are driver-side serializations of small aggregate results;
  * the heavy writes stay distributed.
  */
object GraphBundle {
  private val mapper = new ObjectMapper()

  final case class BundleResult(
      path: String, nodeCount: Long, edgeCount: Long, buildVersion: String)

  private def writeJson(path: java.nio.file.Path, node: ObjectNode): Unit =
    Files.writeString(path, node.toPrettyString)

  def finalizeBundle(spec: GraphSpec, nodes: DataFrame, edges: DataFrame,
                     outDir: String, gzip: Boolean = true): BundleResult = {
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)

    // The finalize tail consumes each frame several times (jsonl write, QC
    // aggregation, schema aggregation); the inputs are typically
    // `from_json` views over the merge's cached JSON, so without a persist
    // every consumer re-parses the JSON per action. One materialization
    // here serves them all; released before return.
    nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sc = nodes.sparkSession.sparkContext
    def labeled[T](desc: String)(f: => T): T = {
      sc.setJobDescription(desc) // guide §1.5: attribute the finalize phases
      try f finally sc.setJobDescription(null)
    }
    try {
    // bundle files (directory-of-parts layout; the scalable form of K1/K2)
    labeled("bundle: nodes.jsonl") {
      KgxIO.writeJsonl(nodes, s"$outDir/nodes.jsonl", dedupKeys = Seq("id"), gzip = gzip)
    }
    labeled("bundle: edges.jsonl") {
      KgxIO.writeJsonl(edges, s"$outDir/edges.jsonl", dedupKeys = Nil, gzip = gzip)
    }

    val qc = labeled("bundle: qc")(MetaKg.qc(nodes, edges))

    val srcVersions = spec.sources.map(s => Versioning.sourceBuildVersion(
      s.id, s.sourceVersion.getOrElse("latest"),
      s.parsingVersion.getOrElse("1.0"), s.normalizationVersion.getOrElse("1.0")))
    val buildVersion = Versioning.graphBuildVersion(srcVersions)

    // graph-metadata.json (DCAT-ish, ref graph_pipeline.py:445-532)
    val meta = mapper.createObjectNode()
    meta.put("graph_id", spec.graphId)
    meta.put("graph_name", spec.graphName)
    meta.put("build_version", buildVersion)
    meta.put("node_count", qc.nodeCount)
    meta.put("edge_count", qc.edgeCount)
    val srcArr = meta.putArray("sources")
    spec.sources.zip(srcVersions).foreach { case (s, v) =>
      val sn = srcArr.addObject()
      sn.put("id", s.id); sn.put("build_version", v)
      sn.put("merge_strategy", s.mergeStrategy)
    }
    writeJson(dir.resolve("graph-metadata.json"), meta)

    // qc-results.json (ref kgx_validation.py:25-213)
    val qcNode = mapper.createObjectNode()
    qcNode.put("node_count", qc.nodeCount)
    qcNode.put("edge_count", qc.edgeCount)
    qcNode.put("edges_missing_nodes", qc.edgesMissingNodes)
    val tc = qcNode.putObject("node_type_counts")
    qc.nodeTypeCounts.toSeq.sortBy(_._1).foreach { case (k, v) => tc.put(k, v) }
    val pc = qcNode.putObject("predicate_counts")
    qc.predicateCounts.toSeq.sortBy(_._1).foreach { case (k, v) => pc.put(k, v) }
    val kc = qcNode.putObject("primary_knowledge_source_counts")
    qc.primaryKsCounts.toSeq.sortBy(_._1).foreach { case (k, v) => kc.put(k, v) }
    val invalidTypesArr = qcNode.putArray("invalid_node_types")
    qc.invalidNodeTypes.foreach(invalidTypesArr.add)
    val deprecatedKsArr = qcNode.putArray("deprecated_knowledge_sources")
    qc.deprecatedKnowledgeSources.foreach(deprecatedKsArr.add)
    val invalidKsArr = qcNode.putArray("invalid_knowledge_sources")
    qc.invalidKnowledgeSources.foreach(invalidKsArr.add)
    val warn = qcNode.putArray("warnings")
    qc.warnings.foreach(warn.add)
    writeJson(dir.resolve("qc-results.json"), qcNode)

    // schema.json — published format (ref kgx_metadata.py:230-447):
    // leaf-category grouping, per-type prefix/attribute/qualifier counts,
    // node/edge summaries
    labeled("bundle: schema.json") {
      graft.derive.SchemaJson.write(nodes, edges, dir.resolve("schema.json").toString)
    }

    BundleResult(outDir, qc.nodeCount, qc.edgeCount, buildVersion)
    } finally { nodes.unpersist(); edges.unpersist() }
  }

  /** O5 — publish: promote a build-version directory to a release-version
    * directory via staging + atomic rename (ref orion/cli/publish_graphs.py:
    * 30-90). The staging copy means a crashed publish never leaves a
    * half-visible release. */
  def publish(buildDir: String, releaseDir: String): Unit = {
    val src = Paths.get(buildDir)
    require(Files.exists(src), s"build dir missing: $buildDir")
    val release = Paths.get(releaseDir)
    val staging = Paths.get(releaseDir + ".staging")
    if (Files.exists(staging)) deleteRecursively(staging)
    copyRecursively(src, staging)
    if (Files.exists(release)) deleteRecursively(release)
    Files.move(staging, release,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def copyRecursively(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(from).iterator().asScala.foreach { p =>
      val dest = to.resolve(from.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dest)
      else Files.copy(p, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}
