package graft.pipeline

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import scala.jdk.CollectionConverters._

/** Declarative build recipes (SURVEY §1.1 GraphSpec/GraphSource).
  * Reference: orion/kgxmodel.py:41-127, YAML parsing
  * orion/graph_pipeline.py:663-763, fixture shape FIXTURES.md §6.
  */
final case class GraphSource(
    id: String,
    mergeStrategy: String = "default", // default | connected_edge_subset | dont_merge
    strictNormalization: Boolean = true,
    sourceVersion: Option[String] = None,
    parsingVersion: Option[String] = None,
    normalizationVersion: Option[String] = None)

final case class GraphSpec(
    graphId: String,
    graphName: String = "",
    outputFormats: Seq[String] = Seq("jsonl"),
    conflation: Boolean = false,
    edgeMergingAttributes: Seq[String] = Nil,
    sources: Seq[GraphSource] = Nil)

object GraphSpec {
  private val yaml = new ObjectMapper(new YAMLFactory())

  private def str(n: JsonNode, f: String, d: String = ""): String =
    if (n.has(f)) n.get(f).asText() else d
  private def strOpt(n: JsonNode, f: String): Option[String] =
    if (n.has(f)) Some(n.get(f).asText()) else None

  /** Parse the reference's graph-spec YAML shape
    * (graph_specs directory; '+'-joined output formats). */
  def parseYaml(text: String): Seq[GraphSpec] = {
    val root = yaml.readTree(text)
    val graphs = if (root.has("graphs")) root.get("graphs") else root
    graphs.elements().asScala.map { g =>
      val sources = if (g.has("sources"))
        g.get("sources").elements().asScala.map { s =>
          GraphSource(
            id = str(s, "id"),
            mergeStrategy = str(s, "merge_strategy", "default"),
            strictNormalization =
              !s.has("strict_normalization") || s.get("strict_normalization").asBoolean(true),
            sourceVersion = strOpt(s, "source_version"),
            parsingVersion = strOpt(s, "parsing_version"),
            normalizationVersion = strOpt(s, "normalization_version"))
        }.toSeq
      else Nil
      GraphSpec(
        graphId = str(g, "graph_id"),
        graphName = str(g, "graph_name"),
        outputFormats = str(g, "output_format", "jsonl").split("\\+").map(_.trim).filter(_.nonEmpty).toSeq,
        conflation = g.has("conflation") && g.get("conflation").asBoolean(false),
        edgeMergingAttributes = if (g.has("edge_merging_attributes"))
          g.get("edge_merging_attributes").elements().asScala.map(_.asText()).toSeq else Nil,
        sources = sources)
    }.toSeq
  }
}

/** Content-hash build versions (SURVEY §2.9 O3).
  * Reference: xxh64(source_id + source/parsing/normalization/supplementation
  * versions) per source (orion/metadata.py:228-239); graph build version =
  * xxh64 over the sorted per-source composites
  * (orion/graph_pipeline.py:320-346).
  */
object Versioning {
  /** xxh64 hexdigest of a UTF-8 string, seed 0 — same digest family the
    * merge keys use (catalyst XXH64). */
  def xxh64Hex(s: String): String = {
    val bytes = s.getBytes("UTF-8")
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 0L)
    f"$h%016x"
  }

  def sourceBuildVersion(sourceId: String, sourceVersion: String,
                         parsingVersion: String, normalizationVersion: String,
                         supplementationVersion: String = "none"): String =
    xxh64Hex(s"${sourceId}_${sourceVersion}_${parsingVersion}_${normalizationVersion}_$supplementationVersion")

  def graphBuildVersion(sourceBuildVersions: Seq[String]): String =
    xxh64Hex(sourceBuildVersions.sorted.mkString("_"))

  /** Semver-ish release selection (ref orion/graph_versioning.py:50-72):
    * next patch on same minor, or explicit. */
  def nextReleaseVersion(existing: Seq[String]): String = {
    val parsed = existing.flatMap { v =>
      v.split("\\.") match {
        case Array(a, b, c) => try Some((a.toInt, b.toInt, c.toInt)) catch { case _: NumberFormatException => None }
        case _ => None
      }
    }
    if (parsed.isEmpty) "1.0.0"
    else {
      val (a, b, c) = parsed.max
      s"$a.$b.${c + 1}"
    }
  }
}
