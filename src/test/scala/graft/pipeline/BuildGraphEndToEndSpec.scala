package graft.pipeline

import graft.SparkSpec
import graft.merge.GraphMerger
import graft.derive.DerivedGraphs
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end build mirroring tests/test_build_graph_end_to_end.py:
  * inline spec → merge overlapping sources → bundle with sidecars. */
class BuildGraphEndToEndSpec extends SparkSpec {

  private val specYaml =
    """graphs:
      |  - graph_id: Example_Graph
      |    graph_name: Example Graph
      |    conflation: true
      |    output_format: jsonl+neo4j
      |    edge_merging_attributes: [ taxon ]
      |    sources:
      |      - id: SourceA
      |        strict_normalization: true
      |      - id: SourceB
      |        merge_strategy: connected_edge_subset
      |""".stripMargin

  test("graph spec YAML parses (FIXTURES.md §6 shape)") {
    val specs = GraphSpec.parseYaml(specYaml)
    assert(specs.length == 1)
    val g = specs.head
    assert(g.graphId == "Example_Graph")
    assert(g.conflation)
    assert(g.outputFormats == Seq("jsonl", "neo4j"))
    assert(g.edgeMergingAttributes == Seq("taxon"))
    assert(g.sources.map(_.id) == Seq("SourceA", "SourceB"))
    assert(g.sources(1).mergeStrategy == "connected_edge_subset")
  }

  test("content-hash build versions are deterministic and order-insensitive") {
    val v1 = Versioning.sourceBuildVersion("CTD", "2024-01", "1.5", "2.0")
    val v2 = Versioning.sourceBuildVersion("CTD", "2024-01", "1.5", "2.0")
    val v3 = Versioning.sourceBuildVersion("CTD", "2024-02", "1.5", "2.0")
    assert(v1 == v2 && v1 != v3 && v1.length == 16)
    assert(Versioning.graphBuildVersion(Seq(v1, v3)) == Versioning.graphBuildVersion(Seq(v3, v1)))
    assert(Versioning.nextReleaseVersion(Seq("1.0.0", "1.0.4")) == "1.0.5")
    assert(Versioning.nextReleaseVersion(Nil) == "1.0.0")
  }

  test("build end-to-end: merge two overlapping sources → bundle + sidecars") {
    import spark.implicits._
    def nodes(r: Range, src: String) = spark.read.json(r.map(i =>
      s"""{"id":"NODE:$i","name":"Node $i","category":["biolink:NamedThing"],"srcs":["$src"]}""").toDS())
    def edges(r: Range) = spark.read.json(r.map(i =>
      s"""{"subject":"NODE:$i","predicate":"biolink:affects","object":"NODE:${i + 1}","primary_knowledge_source":"infores:test"}""").toDS())

    val merged = GraphMerger.mergeGraph(
      primary = Seq(
        GraphMerger.SourceGraph("SourceA", nodes(1 to 20, "a"), edges(1 to 10)),
        GraphMerger.SourceGraph("SourceB", nodes(6 to 25, "b"), edges(6 to 15))))
    assert(merged.nodes.count() == 25)
    assert(merged.mergedNodeCount == 15)
    assert(merged.edges.count() == 15) // 1-10 ∪ 6-15

    // overlap nodes carry both sources (list concat + dedup)
    val n10 = merged.nodes.filter(col("id") === "NODE:10")
      .select(col("srcs")).head().getSeq[String](0)
    assert(n10 == Seq("a", "b"))

    val out = Files.createTempDirectory("bundle").toString
    val spec = GraphSpec.parseYaml(specYaml).head
    val result = GraphBundle.finalizeBundle(spec, merged.nodes, merged.edges, out)
    assert(result.nodeCount == 25 && result.edgeCount == 15)
    assert(Files.exists(Paths.get(out, "nodes.jsonl")))
    assert(Files.exists(Paths.get(out, "edges.jsonl")))
    assert(Files.exists(Paths.get(out, "graph-metadata.json")))
    assert(Files.exists(Paths.get(out, "qc-results.json")))
    assert(Files.exists(Paths.get(out, "schema.json")))
    val qcJson = Files.readString(Paths.get(out, "qc-results.json"))
    assert(qcJson.contains("\"node_count\" : 25"))
    assert(qcJson.contains("\"biolink:affects\" : 15"))
    // infores-catalog validation: infores:test is not in the registry slice
    assert(qcJson.contains("\"invalid_knowledge_sources\" : [ \"infores:test\" ]"))
    assert(qcJson.contains("invalid infores identifier: infores:test"))
    assert(qcJson.contains("\"invalid_node_types\" : [ ]")) // NamedThing is valid
    // published schema.json format (kgx_metadata.py:230-447)
    val schemaJson = Files.readString(Paths.get(out, "schema.json"))
    assert(schemaJson.contains("\"nodes_summary\""))
    assert(schemaJson.contains("\"edges_summary\""))
    assert(schemaJson.contains("\"predicates_by_knowledge_source\""))
    assert(schemaJson.contains("\"subject_id_prefixes\""))
    assert(schemaJson.contains("\"infores:test\" : 15"))
  }

  test("meta-KG trio files (meta_kg.py:14-16)") {
    import spark.implicits._
    val nodes = spark.read.json(Seq(
      """{"id":"HGNC:1","name":"g","category":["biolink:Gene"]}""",
      """{"id":"MONDO:1","name":"d","category":["biolink:Disease"]}""").toDS())
    val edges = spark.read.json(Seq(
      """{"subject":"HGNC:1","predicate":"biolink:gene_associated_with_condition","object":"MONDO:1","publications":["PMID:1"]}""").toDS())
    val out = Files.createTempDirectory("metakg").toString
    graft.derive.MetaKg.writeMetaKgFiles(nodes, edges, out)
    val mk = Files.readString(Paths.get(out, "meta_knowledge_graph.json"))
    assert(mk.contains("\"biolink:Gene\""))
    assert(mk.contains("\"predicate\" : \"biolink:gene_associated_with_condition\""))
    assert(mk.contains("\"publications\""))
    val td = Files.readString(Paths.get(out, "testing_data.json"))
    assert(td.contains("\"subject_id\" : \"HGNC:1\""))
    assert(Files.readAllLines(Paths.get(out, "example_edges.jsonl")).size() == 1)
  }

  test("redundant KG expansion: ancestors + qualifier permutations (redundant_kg.py:51-106)") {
    import spark.implicits._
    val edges = spark.read.json(Seq(
      """{"subject":"A","predicate":"biolink:causes","object":"B","object_aspect_qualifier":"expression","object_direction_qualifier":"upregulated","qualified_predicate":"biolink:causes"}""").toDS())
    val out = DerivedGraphs.redundantEdges(edges)
    // aspects: expression,abundance,activity_or_abundance (3)
    // directions: none,upregulated,increased (3) → 9 permutations
    // + stripped self + 3 strict ancestors (contributes_to, affects, related_to)
    assert(out.count() == 13)
    val stripped = out.filter(col("object_aspect_qualifier").isNull)
    assert(stripped.count() == 4)
    assert(out.filter(col("predicate") === "biolink:related_to").count() == 1)
    // permutations keep qualified_predicate; stripped copies drop it
    assert(out.filter(col("qualified_predicate").isNotNull).count() == 9)
  }

  test("collapsed qualifiers grammar (collapse_qualifiers.py example)") {
    import spark.implicits._
    val edges = spark.read.json(Seq(
      """{"subject":"UNII:7PK6VC94OU","predicate":"biolink:affects","object":"NCBIGene:6531","primary_knowledge_source":"infores:ctd","subject_direction_qualifier":"increased","subject_aspect_qualifier":"abundance","subject_form_or_variant_qualifier":"mutant_form","subject_derivative_qualifier":"transcript","subject_part_qualifier":"polyA_tail","object_aspect_qualifier":"activity","object_direction_qualifier":"upregulated","object_form_or_variant_qualifier":"wildtype_form","object_derivative_qualifier":"protein","object_part_qualifier":"catalytic_site","causal_mechanism_qualifier":"phosphorylation","species_context_qualifier":"human","anatomical_context_qualifier":"liver","qualified_predicate":"biolink:causes"}""").toDS())
    val out = DerivedGraphs.collapsedQualifierEdges(edges)
    val pred = out.select("predicate").head().getString(0)
    assert(pred ==
      "increased_abundance_of_mutant_form_of_<subject_node>_transcript_polyA_tail_causes_" +
      "upregulated_activity_of_wildtype_form_of_<object_node>_protein_catalytic_site_" +
      "via_phosphorylation_in_human_liver")
    assert(!out.columns.contains("object_aspect_qualifier"))
    // unqualified edge keeps its predicate
    val plain = spark.read.json(Seq(
      """{"subject":"A","predicate":"biolink:related_to","object":"B"}""").toDS())
    assert(DerivedGraphs.collapsedQualifierEdges(plain)
      .select("predicate").head().getString(0) == "biolink:related_to")
  }
}
