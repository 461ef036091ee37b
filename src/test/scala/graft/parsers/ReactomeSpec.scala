package graft.parsers

import graft.SparkSpec

/** Fixture-backed Reactome parser spec. The fixture graph export exercises
  * every decision family of the critical-triples table: plain Include,
  * SwitchSO, both Complex hops, the RDF_edges regulation chain (positive,
  * negative, and the silently-dropped unclassified case), the three
  * reference-entity mapping queries, and relationship types absent from
  * the pattern table (species) which must emit nothing. */
class ReactomeSpec extends SparkSpec {

  private lazy val dir = getClass.getResource("/parsers/reactome").getPath
  private lazy val graph = Reactome.parse(spark,
    s"$dir/reactome_graph_nodes.jsonl", s"$dir/reactome_graph_rels.jsonl")

  test("emits exactly the expected edge set") {
    val got = graph.edges
      .select("subject", "predicate", "object", "object_direction_qualifier", "complex_context")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).orNull, Option(r.getString(4)).orNull)).toSet
    val expected = Set(
      ("REACT:R-HSA-100", "biolink:contains_process", "REACT:R-HSA-200", null, null),
      ("REACT:R-HSA-200", "biolink:has_input", "UniProtKB:P12345", null, null),
      ("REACT:R-HSA-200", "biolink:occurs_in", "GO:0005829", null, null),
      ("REACT:R-HSA-100", "biolink:subclass_of", "GO:0016055", null, null),
      // pathway with an exactly-matching GO process maps to the GO id
      ("GO:0007049", "biolink:subclass_of", "GO:0007049", null, null),
      // SwitchSO: disease becomes the subject
      ("DOID:162", "biolink:disease_has_basis_in", "REACT:R-HSA-100", null, null),
      // Include/Complex: component -> target, context = pattern subject's name
      ("UniProtKB:P13473", "biolink:has_part", "REACT:R-HSA-400", null, "WNT binds FZD"),
      // SwitchSO/Complex: disease -> component
      ("DOID:162", "biolink:has_part", "UniProtKB:P13473", null, "LAMP2a multimer"),
      ("CHEBI:15377", "biolink:located_in", "CL:0000540", null, null),
      ("CHEBI:15377", "biolink:affects", "UniProtKB:P04637", "increased", null),
      ("UniProtKB:P01106", "biolink:affects", "UniProtKB:P04637", "decreased", null),
      // the regulation chains' RLE-output->EWAS links also match the plain
      // Include pattern (ReactionLikeEvent, output, EWAS), exactly as the
      // reference's per-row Cypher would emit them
      ("REACT:R-HSA-201", "biolink:has_output", "UniProtKB:P04637", null, null),
      ("REACT:R-HSA-202", "biolink:has_output", "UniProtKB:P04637", null, null),
      ("REACT:R-HSA-203", "biolink:has_output", "UniProtKB:P00533", null, null))
    assert(got === expected)
  }

  test("regulation edges carry the full qualifier set and provenance") {
    val reg = graph.edges.filter("predicate = 'biolink:affects'").collect()
    assert(reg.length === 2)
    reg.foreach { r =>
      assert(r.getAs[String]("qualified_predicate") === "biolink:causes")
      assert(r.getAs[String]("object_aspect_qualifier") === "expression")
      assert(r.getAs[String]("primary_knowledge_source") === "infores:reactome")
      assert(r.getAs[String]("knowledge_level") === "knowledge_assertion")
      assert(r.getAs[String]("agent_type") === "manual_agent")
    }
  }

  test("nodes cover every emitted endpoint, with complex categories") {
    val nodes = graph.nodes.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(nodes.keySet === Set(
      "REACT:R-HSA-100", "REACT:R-HSA-200", "UniProtKB:P12345", "GO:0005829",
      "GO:0016055", "GO:0007049", "DOID:162", "UniProtKB:P13473",
      "REACT:R-HSA-400", "CHEBI:15377", "CL:0000540", "UniProtKB:P04637",
      "UniProtKB:P01106", "REACT:R-HSA-201", "REACT:R-HSA-202",
      "REACT:R-HSA-203", "UniProtKB:P00533"))
    assert(nodes("REACT:R-HSA-400").getAs[Seq[String]]("category") ===
      Seq("biolink:NamedThing", "biolink:MacromolecularComplex"))
    assert(nodes("REACT:R-HSA-200").getAs[Seq[String]]("category") ===
      Seq("biolink:NamedThing"))
    assert(nodes("GO:0005829").getAs[String]("definition") ===
      "The part of the cytoplasm that does not contain organelles.")
  }

  test("unclassified regulations and non-pattern relationship types emit nothing") {
    // the EGFR chain hangs off a Regulation that is neither positive nor
    // negative: its plain output edge survives, but no affects edge does
    assert(graph.edges.filter(
      "predicate = 'biolink:affects' and (object like '%P00533%' or subject like '%P00533%')")
      .count() === 0)
    // species relationships have no pattern-table row
    assert(graph.edges.filter("predicate = 'biolink:in_taxon'").count() === 0)
  }

  test("registry resolves Reactome") {
    assert(Registry.parsers.contains("Reactome"))
  }
}
