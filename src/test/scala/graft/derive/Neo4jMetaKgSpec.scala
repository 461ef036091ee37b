package graft.derive

import graft.SparkSpec
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** D7: the Plater-style meta-KG from DataFrames — NamedThing filtering,
  * inverse augmentation (inverted meta-edges get no test edges),
  * qualifier-preferring examples, attribute shapes, both output files. */
class Neo4jMetaKgSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private lazy val (nodes, edges) = {
    val n = spark.read.json(spark.createDataset(Seq(
      """{"id":"CHEBI:1","category":["biolink:NamedThing","biolink:ChemicalEntity"],"name":"c1","equivalent_identifiers":["X:1"]}""",
      """{"id":"NCBIGene:2","category":["biolink:NamedThing","biolink:Gene"],"name":"g1"}""",
      """{"id":"NCBIGene:3","category":["biolink:NamedThing","biolink:Gene"],"name":"g2"}""",
      """{"id":"MONDO:4","category":["biolink:NamedThing","biolink:Disease"],"name":"d1"}""",
      """{"id":"ONLY:5","category":["biolink:NamedThing"],"name":"namedthing-only"}"""
    ))(org.apache.spark.sql.Encoders.STRING))
    val e = spark.read.json(spark.createDataset(Seq(
      // two chemical->gene affects edges: one qualified, one not — the
      // qualified one must be the example
      """{"subject":"CHEBI:1","predicate":"biolink:affects","object":"NCBIGene:2","qualified_predicate":"biolink:causes","object_aspect_qualifier":"activity"}""",
      """{"subject":"CHEBI:1","predicate":"biolink:affects","object":"NCBIGene:3"}""",
      // gene->disease: predicate with a known inverse not present -> augmented
      """{"subject":"NCBIGene:2","predicate":"biolink:causes","object":"MONDO:4"}""",
      // edge touching the NamedThing-only node: excluded from the schema
      """{"subject":"ONLY:5","predicate":"biolink:related_to","object":"NCBIGene:2"}"""
    ))(org.apache.spark.sql.Encoders.STRING))
    (n, e)
  }

  private lazy val outDir = {
    val d = Files.createTempDirectory("d7-").toString
    Neo4jMetaKg.generate(nodes, edges, d)
    d
  }

  private lazy val metaKg = mapper.readTree(Files.readString(Paths.get(outDir, "neo4j_generated_meta_kg.json")))
  private lazy val testData = mapper.readTree(Files.readString(Paths.get(outDir, "neo4j_generated_test_data.json")))

  private def metaEdgeSet = metaKg.get("edges").elements().asScala
    .map(e => (e.get("subject").asText, e.get("predicate").asText, e.get("object").asText)).toSet

  test("schema includes observed triples, inverse augmentation, and NamedThing filtering") {
    val edgesSet = metaEdgeSet
    assert(edgesSet.contains(("biolink:ChemicalEntity", "biolink:affects", "biolink:Gene")))
    assert(edgesSet.contains(("biolink:Gene", "biolink:causes", "biolink:Disease")))
    // augmented inverses
    assert(edgesSet.contains(("biolink:Gene", "biolink:affected_by", "biolink:ChemicalEntity")))
    assert(edgesSet.contains(("biolink:Disease", "biolink:caused_by", "biolink:Gene")))
    // the NamedThing-only node contributes nothing
    assert(!edgesSet.exists(t => t._1 == "biolink:NamedThing" || t._3 == "biolink:NamedThing"))
  }

  test("meta nodes carry observed prefixes and biolink attribute shapes; name/id skipped") {
    val chem = metaKg.get("nodes").get("biolink:ChemicalEntity")
    assert(chem.get("id_prefixes").elements().asScala.map(_.asText).toSeq === Seq("CHEBI"))
    val attrs = chem.get("attributes").elements().asScala
      .map(a => a.get("original_attribute_names").get(0).asText ->
        (a.get("attribute_type_id").asText, a.get("value_type_id").asText)).toMap
    assert(!attrs.contains("name") && !attrs.contains("id"))
    assert(attrs("equivalent_identifiers") === ("biolink:same_as", "metatype:uriorcurie"))
  }

  test("test edges prefer qualified examples and skip derived inverses") {
    assert(testData.get("source_type").asText === "primary")
    val tes = testData.get("edges").elements().asScala.toSeq
    val affects = tes.find(t => t.get("predicate").asText == "biolink:affects").get
    // the qualified example (object NCBIGene:2) wins over the unqualified one
    assert(affects.get("object_id").asText === "NCBIGene:2")
    val quals = affects.get("qualifiers").elements().asScala
      .map(q => q.get("qualifier_type_id").asText -> q.get("qualifier_value").asText).toMap
    assert(quals("biolink:qualified_predicate") === "biolink:causes")
    assert(quals("biolink:object_aspect_qualifier") === "activity")
    // no test edge for the derived inverse predicates
    assert(!tes.exists(t => t.get("predicate").asText == "biolink:affected_by"))
    assert(!tes.exists(t => t.get("predicate").asText == "biolink:caused_by"))
  }
}
