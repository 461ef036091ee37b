package graft.derive

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Published schema.json serialization (kgx_metadata.py:230-447): leaf
  * grouping, count-sorted maps, qualifier/attribute split, summaries. */
class SchemaJsonSpec extends SparkSpec {

  test("leaf-category grouping + qualifier/attribute split + summaries") {
    import spark.implicits._
    val nodes = spark.read.json(Seq(
      // leaf group {Gene} — NamedThing ancestor dropped by leaf computation
      """{"id":"HGNC:1","name":"g1","category":["biolink:NamedThing","biolink:Gene"],"taxon":"NCBITaxon:9606"}""",
      """{"id":"HGNC:2","name":"g2","category":["biolink:Gene"]}""",
      """{"id":"MONDO:1","name":"d","category":["biolink:Disease","biolink:DiseaseOrPhenotypicFeature"]}""").toDS())
    val edges = spark.read.json(Seq(
      """{"subject":"HGNC:1","predicate":"biolink:gene_associated_with_condition","object":"MONDO:1","primary_knowledge_source":"infores:test","publications":["PMID:1"],"object_aspect_qualifier":"activity"}""",
      """{"subject":"HGNC:2","predicate":"biolink:gene_associated_with_condition","object":"MONDO:1","primary_knowledge_source":"infores:test"}""").toDS())

    val root = SchemaJson.build(nodes, edges)

    // node groups: {Gene} ×2 and {Disease} ×1 (ancestors leaf-dropped)
    val nodesArr = root.get("nodes")
    assert(nodesArr.size() == 2)
    val byFirstCat = (0 until nodesArr.size()).map(nodesArr.get)
      .map(n => n.get("category").get(0).asText() -> n).toMap
    assert(byFirstCat("biolink:Gene").get("count").asLong() == 2)
    assert(byFirstCat("biolink:Gene").get("id_prefixes").get("HGNC").asLong() == 2)
    assert(byFirstCat("biolink:Gene").get("attributes").get("name").asLong() == 2)
    assert(byFirstCat("biolink:Gene").get("attributes").get("taxon").asLong() == 1)
    assert(byFirstCat("biolink:Disease").get("count").asLong() == 1)

    assert(root.get("nodes_summary").get("total_count").asLong() == 3)
    assert(root.get("nodes_summary").get("id_prefixes").get("HGNC").asLong() == 2)

    // one edge type; qualifier counted apart from attributes
    val edgesArr = root.get("edges")
    assert(edgesArr.size() == 1)
    val e = edgesArr.get(0)
    assert(e.get("predicate").asText() == "biolink:gene_associated_with_condition")
    assert(e.get("count").asLong() == 2)
    assert(e.get("primary_knowledge_sources").get("infores:test").asLong() == 2)
    assert(e.get("qualifiers").get("object_aspect_qualifier").asLong() == 1)
    assert(e.get("attributes").get("publications").asLong() == 1)
    assert(e.get("attributes").has("object_aspect_qualifier") == false)
    assert(e.get("subject_id_prefixes").get("HGNC").asLong() == 2)

    val es = root.get("edges_summary")
    assert(es.get("total_count").asLong() == 2)
    assert(es.get("predicates_by_knowledge_source").get("infores:test")
      .get("biolink:gene_associated_with_condition").asLong() == 2)
  }

  test("QC flags invalid node types and deprecated/invalid knowledge sources") {
    import spark.implicits._
    val nodes = spark.read.json(Seq(
      """{"id":"X:1","name":"a","category":["custom:Widget"]}""",
      """{"id":"HGNC:1","name":"g","category":["biolink:Gene"]}""").toDS())
    val edges = spark.read.json(Seq(
      """{"subject":"X:1","predicate":"biolink:related_to","object":"HGNC:1","primary_knowledge_source":"infores:ncbigene"}""",
      """{"subject":"HGNC:1","predicate":"biolink:related_to","object":"X:1","primary_knowledge_source":"infores:not-in-registry"}""").toDS())
    val qc = MetaKg.qc(nodes, edges)
    assert(qc.invalidNodeTypes == Seq("custom:Widget"))
    assert(qc.deprecatedKnowledgeSources == Seq("infores:ncbigene"))
    assert(qc.invalidKnowledgeSources == Seq("infores:not-in-registry"))
    assert(qc.warnings.exists(_.contains("deprecated infores identifier: infores:ncbigene")))
    val out = Files.createTempDirectory("schema-spec").toString
    SchemaJson.write(nodes, edges, s"$out/schema.json")
    assert(Files.exists(Paths.get(out, "schema.json")))
  }
}
