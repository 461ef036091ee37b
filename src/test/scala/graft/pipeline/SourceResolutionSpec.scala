package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Recursive dependency resolution: local → registry → produce, subgraph
  * recursion, cycle detection (source_resolution.py:39-244). */
class SourceResolutionSpec extends SparkSpec {

  private def mkBundle(root: String, id: String, bv: String): String = {
    val dir = Paths.get(root, id, bv)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("graph-metadata.json"), s"""{"graph_id":"$id"}""")
    Files.writeString(dir.resolve("nodes.jsonl"), """{"id":"N:1"}""" + "\n")
    Files.writeString(dir.resolve("edges.jsonl"), "")
    dir.toString
  }

  private def resolver(root: String,
                       specs: Map[String, GraphSpec] = Map.empty,
                       parserIds: Set[String] = Set("SourceA", "SourceB"),
                       registry: SourceResolution.RegistryClient = SourceResolution.NoRegistry,
                       built: scala.collection.mutable.Buffer[String] = scala.collection.mutable.Buffer())
      : SourceResolution.Resolver =
    SourceResolution.Resolver(
      graphsDir = root,
      graphSpecs = specs,
      parserSourceIds = parserIds,
      buildParser = s => {
        built += s"parser:${s.id}"
        val r = resolver(root, specs, parserIds)
        Some(mkBundle(root, s.id, r.sourceBuildVersion(s)))
      },
      buildGraph = g => {
        built += s"graph:${g.graphId}"
        val r = resolver(root, specs, parserIds)
        Some(mkBundle(root, g.graphId, r.graphBuildVersion(g)))
      },
      registry = registry)

  test("local bundle resolves without building") {
    val root = Files.createTempDirectory("resolve-").toString
    val built = scala.collection.mutable.Buffer[String]()
    val r = resolver(root, built = built)
    val src = GraphSource("SourceA")
    mkBundle(root, "SourceA", r.sourceBuildVersion(src))
    val resolved = r.resolve(src).get
    assert(resolved.via == "local")
    assert(built.isEmpty)
  }

  test("missing parser source is produced via the ingest seam") {
    val root = Files.createTempDirectory("resolve-").toString
    val built = scala.collection.mutable.Buffer[String]()
    val r = resolver(root, built = built)
    val resolved = r.resolve(GraphSource("SourceA")).get
    assert(resolved.via == "built-parser")
    assert(built == Seq("parser:SourceA"))
    // second resolve finds the bundle locally
    val again = resolver(root).resolve(GraphSource("SourceA")).get
    assert(again.via == "local")
  }

  test("registry client is consulted between local and produce") {
    val root = Files.createTempDirectory("resolve-").toString
    val fetched = scala.collection.mutable.Buffer[String]()
    val reg = new SourceResolution.RegistryClient {
      override def fetchBundle(id: String, bv: String, dest: String): Boolean = {
        fetched += s"$id@$bv"; mkBundle(root, id, bv); true
      }
    }
    val r = resolver(root, registry = reg)
    val resolved = r.resolve(GraphSource("SourceA")).get
    assert(resolved.via == "registry")
    assert(fetched.size == 1)
  }

  test("graph dependency recursively builds the subgraph spec") {
    val root = Files.createTempDirectory("resolve-").toString
    val built = scala.collection.mutable.Buffer[String]()
    val subSpec = GraphSpec("SubGraph", sources = Seq(GraphSource("SourceA")))
    val r = resolver(root, specs = Map("SubGraph" -> subSpec),
      parserIds = Set("SourceA"), built = built)
    val resolved = r.resolve(GraphSource("SubGraph")).get
    assert(resolved.via == "built-subgraph")
    // the subgraph's own parser source was produced first, then the graph
    assert(built == Seq("parser:SourceA", "graph:SubGraph"))
  }

  test("dependency cycles fail deterministically") {
    val root = Files.createTempDirectory("resolve-").toString
    val a = GraphSpec("GraphA", sources = Seq(GraphSource("GraphB")))
    val b = GraphSpec("GraphB", sources = Seq(GraphSource("GraphA")))
    val r = resolver(root, specs = Map("GraphA" -> a, "GraphB" -> b), parserIds = Set.empty)
    val e = intercept[IllegalStateException] { r.resolveAll(a) }
    assert(e.getMessage.contains("dependency cycle"))
  }

  test("unknown source with no spec and no parser fails to resolve") {
    val root = Files.createTempDirectory("resolve-").toString
    val r = resolver(root, parserIds = Set.empty)
    assert(r.resolve(GraphSource("Mystery")).isEmpty)
  }
}
