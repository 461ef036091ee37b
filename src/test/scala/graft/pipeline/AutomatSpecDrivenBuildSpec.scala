package graft.pipeline

import graft.SparkSpec
import graft.parsers.{DerbyFixtures, Registry}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The reference's SECOND production workload, VERBATIM: every
  * non-commented graph in `graph_specs/automat-graph-spec.yaml` (the
  * one-graph-per-source Automat shape — ~23 graphs, most paired with an
  * OntologicalHierarchy `connected_edge_subset` secondary) parses from
  * the reference YAML and builds end-to-end through the production
  * spec → loaders → merge → bundle pipeline over checked-in fixtures.
  * Complements SpecDrivenBuildSpec (the 28-source robokop Baseline):
  * that spec proves the wide-merge shape, this one proves the fan-out
  * shape — many small graphs sharing staged sources, each with its own
  * bundle, counts, and digest-stable artifacts. */
class AutomatSpecDrivenBuildSpec extends SparkSpec {

  private val refYaml = "/root/reference/graph_specs/automat-graph-spec.yaml"
  private val res = "src/test/resources/parsers"

  /** Automat source id → fixture dir (the robokop map plus the ids only
    * Automat uses). DrugCentral/PHAROS seed embedded Derby; Hetio
    * re-names its fixture to the registry's production filename. */
  private val fixtureDir = Map(
    "BINDING-DB" -> "binding", "CAM-KP" -> "camkp", "COHD" -> "cohd",
    "CTD" -> "ctd", "GenomeAllianceOrthologs" -> "alliance",
    "GTEx" -> "gtex", "GtoPdb" -> "gtopdb", "GWASCatalog" -> "gwas",
    "HGNC" -> "hgnc", "HMDB" -> "hmdb", "HumanGOA" -> "goa",
    "MouseGOA" -> "goa", "IntAct" -> "intact", "OHD-Carolina" -> "ohd",
    "OntologicalHierarchy" -> "ubergraph", "PANTHER" -> "panther",
    "Reactome" -> "reactome", "STRING-DB-Human" -> "string",
    "textminingkp" -> "tmkp", "UbergraphRedundant" -> "ubergraph",
    "ViralProteome" -> "viralproteome")

  private def stageSources(ids: Seq[String]): String = {
    val stage = Files.createTempDirectory("automat-spec-").toString
    ids.distinct.foreach {
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
        val src = fixtureDir(id) // fails loud on an unmapped id
        Files.createSymbolicLink(Paths.get(s"$stage/$id"),
          Paths.get(res, src).toAbsolutePath)
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

  test("automat-graph-spec.yaml: every non-commented graph builds from fixtures") {
    assume(new java.io.File(refYaml).isFile, "reference graph spec not available")
    val specs = GraphSpec.parseYaml(Files.readString(Paths.get(refYaml)))
    // the production inventory: 23 active graphs (DrugMechDB_Automat is
    // commented out upstream), all targeting the neo4j output plane
    assert(specs.size == 23, specs.map(_.graphId).mkString(", "))
    assert(specs.map(_.graphId).forall(_.endsWith("_Automat")))
    assert(specs.forall(_.outputFormats == Seq("neo4j")))
    // the per-source pairing shape: primary source + optional
    // OntologicalHierarchy connected_edge_subset secondary
    assert(specs.forall(_.sources.size <= 2))
    val withHierarchy = specs.filter(_.sources.exists(s =>
      s.id == "OntologicalHierarchy" && s.mergeStrategy == "connected_edge_subset"))
    assert(withHierarchy.size >= 15, withHierarchy.map(_.graphId).toString)
    // CTD_Automat carries the taxon edge-merging attribute
    assert(specs.find(_.graphId == "CTD_Automat").get
      .edgeMergingAttributes == Seq("taxon"))
    // every source id resolves through the registry (throws if not)
    specs.flatMap(_.sources).foreach(s => Registry(s.id))

    // one shared staging area: Automat graphs share fetched sources in
    // production too (the storage dir is per-source, not per-graph)
    val allIds = specs.flatMap(_.sources.map(_.id)).distinct
    val stage = stageSources(allIds)

    val results = specs.map { spec =>
      val loaders = spec.sources.map(s =>
        s.id -> (new StagedLoader(s.id, s"$stage/${s.id}"): IngestPipeline.SourceLoader)).toMap
      val out = Files.createTempDirectory(s"automat-${spec.graphId}-").toString
      val bundle = IngestPipeline.buildGraph(spark, spec, loaders, out)
      assert(bundle.nodeCount > 0, s"${spec.graphId}: empty node set")
      assert(bundle.edgeCount > 0, s"${spec.graphId}: empty edge set")
      assert(Files.exists(Paths.get(out, "nodes.jsonl")), spec.graphId)
      assert(Files.exists(Paths.get(out, "edges.jsonl")), spec.graphId)
      assert(Files.exists(Paths.get(out, "graph-metadata.json")), spec.graphId)
      spec.graphId -> out
    }.toMap
    assert(results.size == 23)

    // digest stability on two representative shapes: a paired graph
    // (primary + connected_edge_subset) and a single-source graph —
    // rebuilding the same spec must reproduce the bundle byte-for-byte
    Seq("CTD_Automat", "UbergraphRedundant_Automat").foreach { gid =>
      val spec = specs.find(_.graphId == gid).get
      val loaders = spec.sources.map(s =>
        s.id -> (new StagedLoader(s.id, s"$stage/${s.id}"): IngestPipeline.SourceLoader)).toMap
      val out2 = Files.createTempDirectory(s"automat-rebuild-$gid-").toString
      IngestPipeline.buildGraph(spark, spec, loaders, out2)
      assert(digests(spark, results(gid)) == digests(spark, out2), gid)
    }
  }
}
