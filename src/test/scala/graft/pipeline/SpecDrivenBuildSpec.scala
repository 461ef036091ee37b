package graft.pipeline

import graft.SparkSpec
import graft.parsers.{DerbyFixtures, Registry}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The reference's robokop-graph-spec.yaml, VERBATIM, end-to-end: the
  * Baseline graph's full source list (28 sources, conflation, taxon
  * edge-merging, the OntologicalHierarchy connected_edge_subset
  * strategy) is parsed from the reference YAML file and driven through
  * the production spec → loaders → merge → bundle pipeline over
  * checked-in fixtures — every listed source resolved by the Registry,
  * including the two embedded-Derby SQL sources. Asserted invariants:
  * run-to-run digest stability on the same spec (scheduling/scan order
  * must not leak), and count-invariance under source permutation (spec
  * order legitimately picks first-truthy-wins property winners, but
  * never changes the merged key sets). */
class SpecDrivenBuildSpec extends SparkSpec {

  private val refYaml = "/root/reference/graph_specs/robokop-graph-spec.yaml"
  private val res = "src/test/resources/parsers"

  /** Baseline source id → fixture staging: most stage as a symlink of a
    * checked-in fixture dir; Hetio re-names its fixture to the
    * registry's expected production filename; the SQL sources seed
    * embedded Derby databases in place. */
  private val fixtureDir = Map(
    "BINDING-DB" -> "binding", "BgeeHuman" -> "bgee", "CCIDB" -> "ccidb",
    "CHEBIProps" -> "chebi", "ClinGenDosageSensitivity" -> "clingen",
    "ClinGenGeneDiseaseValidity" -> "clingen", "CTD" -> "ctd",
    "DrugMechDB" -> "drugmechdb", "GtoPdb" -> "gtopdb", "HGNC" -> "hgnc",
    "HMDB" -> "hmdb", "HumanGOA" -> "goa", "IntAct" -> "intact",
    "KinAce" -> "kinace", "LINCS" -> "cfde_lincs",
    "MetabolomicsWorkbench" -> "cfde_mw", "MonarchKG" -> "monarch",
    "MONDOProps" -> "mondo", "OntologicalHierarchy" -> "ubergraph",
    "PANTHER" -> "panther", "Reactome" -> "reactome",
    "textminingkp" -> "tmkp", "SIGNOR" -> "signor",
    "STRING-DB-Human" -> "string", "UbergraphNonredundant" -> "ubergraph")

  private def stageSources(ids: Seq[String]): String = {
    val stage = Files.createTempDirectory("spec-driven-").toString
    ids.foreach {
      case "DrugCentral" =>
        val d = s"$stage/DrugCentral"; Files.createDirectories(Paths.get(d))
        DerbyFixtures.seedDrugCentral(d)
      case "PHAROS" =>
        val d = s"$stage/PHAROS"; Files.createDirectories(Paths.get(d))
        DerbyFixtures.seedPharos(d)
      case "Hetio" =>
        val d = s"$stage/Hetio"; Files.createDirectories(Paths.get(d))
        Files.copy(Paths.get(s"$res/hetio/hetionet-test.json.bz2"),
          Paths.get(s"$d/hetionet-v1.0.json.bz2"), StandardCopyOption.REPLACE_EXISTING)
      case id =>
        val src = Paths.get(fixtureDir(id)) // fails loud on an unmapped id
        Files.createSymbolicLink(Paths.get(s"$stage/$id"),
          Paths.get(res, src.toString).toAbsolutePath)
    }
    stage
  }

  private class StagedLoader(val sourceId: String, dir: String)
      extends IngestPipeline.SourceLoader {
    override def parse(spark: org.apache.spark.sql.SparkSession) = {
      val g = Registry(sourceId)(spark, dir)
      (g.nodes, g.edges)
    }
    override def nodeNormMapDefined: Boolean = false
  }

  private def digests(spark: org.apache.spark.sql.SparkSession, out: String): (String, String) = {
    def d(file: String): String = {
      val lines = spark.read.textFile(s"$out/$file").collect().sorted
      val md = java.security.MessageDigest.getInstance("SHA-256")
      lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    }
    (d("nodes.jsonl"), d("edges.jsonl"))
  }

  test("robokop-graph-spec.yaml Baseline: 28 sources parse, build, and digest-stably merge") {
    assume(new java.io.File(refYaml).isFile, "reference graph spec not available")
    val specs = GraphSpec.parseYaml(Files.readString(Paths.get(refYaml)))
    // the spec file's graph inventory parses verbatim
    assert(specs.map(_.graphId).contains("Baseline"))
    val baseline = specs.find(_.graphId == "Baseline").get
    assert(baseline.sources.size == 28)
    assert(baseline.conflation)
    assert(baseline.edgeMergingAttributes == Seq("taxon"))
    assert(baseline.sources.find(_.id == "OntologicalHierarchy")
      .get.mergeStrategy == "connected_edge_subset")
    // every listed source resolves to a registered parser (throws if not)
    baseline.sources.foreach(s => Registry(s.id))

    val stage = stageSources(baseline.sources.map(_.id))
    def loaders(spec: GraphSpec): Map[String, IngestPipeline.SourceLoader] =
      spec.sources.map(s =>
        s.id -> (new StagedLoader(s.id, s"$stage/${s.id}"): IngestPipeline.SourceLoader)).toMap

    val out1 = Files.createTempDirectory("spec-build-1-").toString
    val bundle = IngestPipeline.buildGraph(spark, baseline, loaders(baseline), out1)
    assert(bundle.nodeCount > 0 && bundle.edgeCount > 0)
    // every source produced a content-versioned build under sources/
    baseline.sources.foreach(s =>
      assert(Files.isDirectory(Paths.get(out1, "sources", s.id)), s.id))
    // bundle artifacts
    assert(Files.exists(Paths.get(out1, "nodes.jsonl")))
    assert(Files.exists(Paths.get(out1, "edges.jsonl")))
    assert(Files.exists(Paths.get(out1, "graph-metadata.json")))

    // run-to-run digest stability on the SAME spec: Spark task scheduling,
    // shuffle partitioning, and scan order must not leak into the bundle
    val out2 = Files.createTempDirectory("spec-build-2-").toString
    IngestPipeline.buildGraph(spark, baseline, loaders(baseline), out2)
    assert(digests(spark, out1) == digests(spark, out2))

    // a PERMUTED spec legitimately changes first-truthy-wins property
    // winners (the reference merges in spec order), but never the merged
    // KEY sets: node/edge counts must be permutation-invariant
    val permuted = baseline.copy(sources = new scala.util.Random(11).shuffle(baseline.sources))
    assert(permuted.sources != baseline.sources)
    val out3 = Files.createTempDirectory("spec-build-3-").toString
    val b3 = IngestPipeline.buildGraph(spark, permuted, loaders(permuted), out3)
    assert(b3.nodeCount == bundle.nodeCount && b3.edgeCount == bundle.edgeCount)
  }
}
