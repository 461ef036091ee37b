package graft.pipeline

import graft.SparkSpec
import graft.normalize.Normalizer
import graft.parsers.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The §3.1 orion-build lifecycle end-to-end with REAL parsers: HGNC and
  * GOA fixture sources run through parse → normalize → merge → bundle,
  * the path a reference user takes with `orion-build <graph_id>`. */
class RealParserBuildSpec extends SparkSpec {

  private val res = "src/test/resources/parsers"

  private class ParserLoader(val sourceId: String, dir: String,
                             norm: Option[Seq[Normalizer.NodeNormEntry]] = None)
      extends IngestPipeline.SourceLoader {
    override def parse(spark: SparkSession): (DataFrame, DataFrame) = {
      val g = Registry(sourceId)(spark, dir)
      (g.nodes, g.edges)
    }
    override def nodeNormMap(spark: SparkSession): Option[DataFrame] =
      norm.map(Normalizer.nodeMapDf(spark, _))
    override def nodeNormMapDefined: Boolean = norm.isDefined
  }

  test("build a two-source graph from the HGNC and GOA parsers") {
    val out = Files.createTempDirectory("real-build-").toString
    val spec = GraphSpec(
      graphId = "HGNC_GOA_Test",
      graphName = "HGNC + GOA fixture graph",
      sources = Seq(GraphSource("HGNC"), GraphSource("GOA")))

    val result = IngestPipeline.buildGraph(spark, spec,
      loaders = Map(
        "HGNC" -> new ParserLoader("HGNC", s"$res/hgnc"),
        "GOA" -> new ParserLoader("GOA", s"$res/goa")),
      outDir = out)

    // 7 HGNC nodes + 8 GOA nodes, no id overlap in the fixtures
    assert(result.nodeCount == 15)
    assert(result.edgeCount == 7) // 4 HGNC member_of + 3 GOA annotations

    // per-source content-versioned build dirs with completion markers
    val hgncDirs = Files.list(Paths.get(out, "sources", "HGNC")).toArray
    assert(hgncDirs.length == 1)
    assert(Files.exists(Paths.get(hgncDirs.head.toString, "_BUILD_COMPLETE")))

    // bundle sidecars carry the real contents
    val qc = Files.readString(Paths.get(out, "qc-results.json"))
    assert(qc.contains("\"RO:0002350\" : 4"))   // HGNC membership predicate
    assert(qc.contains("\"infores:goa\""))
    val schema = Files.readString(Paths.get(out, "schema.json"))
    assert(schema.contains("biolink:GeneFamily"))
    assert(schema.contains("\"infores:hgnc\" : 4"))

    // bundle nodes re-read: HGNC gene carries its parser props
    val nodes = spark.read.json(s"$out/nodes.jsonl")
    val gene = nodes.filter(col("id") === "HGNC:5").head()
    assert(gene.getAs[String]("symbol") == "A1BG")
  }

  test("normalization folds into the parser build when a map is supplied") {
    val out = Files.createTempDirectory("real-build-norm-").toString
    // normalize the two GOA UniProtKB subjects onto one canonical id
    val norm = Seq(
      Normalizer.NodeNormEntry("UniProtKB:P12345", "NCBIGene:100", "ADA", Seq("biolink:Gene")),
      Normalizer.NodeNormEntry("UniProtKB:P11111", "NCBIGene:100", "ADA", Seq("biolink:Gene")),
      Normalizer.NodeNormEntry("MGI:101757", "NCBIGene:200", "Cfl1", Seq("biolink:Gene")),
      Normalizer.NodeNormEntry("GO:0003674", "GO:0003674", "molecular_function", Seq("biolink:MolecularActivity")),
      Normalizer.NodeNormEntry("GO:0000281", "GO:0000281", "mitotic cytokinesis", Seq("biolink:BiologicalProcess")),
      Normalizer.NodeNormEntry("GO:0005737", "GO:0005737", "cytoplasm", Seq("biolink:CellularComponent")),
      Normalizer.NodeNormEntry("GO:0005515", "GO:0005515", "protein binding", Seq("biolink:MolecularActivity")))
    val r = IngestPipeline.runSource(spark,
      new ParserLoader("GOA", s"$res/goa", norm = Some(norm)), s"$out/sources")
    // two UniProt subjects merged onto NCBIGene:100; P99999 (unmapped) dropped strict
    val ids = r.nodes.select("id").collect().map(_.getString(0)).toSet
    assert(ids.contains("NCBIGene:100"))
    assert(!ids.exists(_.startsWith("UniProtKB:")))
    val subjects = r.edges.select("subject").collect().map(_.getString(0)).toSet
    assert(subjects == Set("NCBIGene:100", "NCBIGene:200"))
  }
}
