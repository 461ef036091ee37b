package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.extract.Extractor.ExtractedGraph

/** Reactome parser.
  *
  * The reference (parsers/Reactome/src/loadReactome.py) restores the
  * Reactome neo4j dump into a live Neo4j server and runs one Cypher query
  * per row of its critical-triples pattern table
  * (reactomeContents_CriticalTriples.csv:1-35), emitting KGX edges from the
  * matches (loadReactome.py:174-226) after mapping internal node ids to
  * CURIEs through a reference-entity lookup (loadReactome.py:267-316).
  *
  * Spark-first re-expression: the dump is consumed as a flat graph export —
  * node rows (identity, labels, properties) and relationship rows
  * (start, end, type), the shape an `apoc.export.json.all`-style dump
  * produces, materialized at fetch time behind the same external-tool seam
  * as [[graft.io.Neo4jTools]] (the graph database itself is a single-node
  * tool that cannot run inside executors). Every Cypher pattern then
  * becomes part of ONE broadcast join of the (tiny) pattern table against
  * the relationship scan + exploded label index, instead of 30+ serial
  * graph queries:
  *
  *  - `Include` / `Include/SwitchSO` (loadReactome.py:205-216): label-match
  *    both endpoints; SwitchSO emits the edge object→subject.
  *  - `Include/Complex` / `Include/SwitchSO/Complex` (:188-204): one extra
  *    join hop through the subject's `hasComponent` relationships; the
  *    emitted relationship type is `hasComponent` (→ biolink:has_part) and
  *    the pattern subject's `name` rides along as `complex_context`,
  *    mirroring the reference's `type(r) as r_type` projection.
  *  - `RDF_edges/Include` (:181-187): the gene-expression regulation chain
  *    regulator←Regulation–regulatedBy–ReactionLikeEvent–output–target
  *    with `displayName CONTAINS 'Expression of'`; `regulatedBy`/`output`
  *    are matched in both directions (the Cypher leaves them undirected).
  *    Regulations that are neither positive nor negative emit nothing
  *    (:322-335).
  *
  * Node CURIE mapping follows process_node_from_neo4j (:346-383): on-node
  * classes map from their own databaseName/identifier (Species → taxId,
  * GO_Term → accession), normalized event classes use REACT:stId (Pathways
  * preferring an exactly-matching GO biological process), cross-mapping
  * entity classes use the reference-entity CURIE when one exists. The
  * reference keeps the first reference-entity per node in Neo4j result
  * order (:311-315); here the choice is deterministic — lowest
  * (query-priority, curie) — which is a superset-stable refinement of
  * "first seen".
  *
  * Scale: the pattern table is O(10) rows (broadcast), the label index and
  * relationship scan shuffle on internal node ids (longs), and the
  * reference-entity map is built once and reused — all equi-joins, no
  * driver-side iteration, so a full Reactome export (~2M nodes / ~10M
  * relationships) partitions evenly.
  */
object Reactome {

  val provenance = "infores:reactome"

  /** relationship type → biolink predicate (loadReactome.py:26-42). */
  val predicateMap: Map[String, String] = Map(
    "compartment" -> "biolink:occurs_in",
    "output" -> "biolink:has_output",
    "input" -> "biolink:has_input",
    "hasEvent" -> "biolink:contains_process",
    "normalPathway" -> "biolink:contains_process",
    "normalReaction" -> "biolink:contains_process",
    "precedingEvent" -> "biolink:precedes",
    "activeUnit" -> "biolink:actively_involves",
    "hasComponent" -> "biolink:has_part",
    "catalystActivity" -> "biolink:actively_involves",
    "cellType" -> "biolink:located_in",
    "goBiologicalProcess" -> "biolink:subclass_of",
    "disease" -> "biolink:disease_has_basis_in",
    "regulator" -> "biolink:affects",
    "species" -> "biolink:in_taxon",
    "includedLocation" -> "biolink:located_in")

  /** reactome databaseName → CURIE prefix (loadReactome.py:46-58); unmapped
    * names fall through to the raw databaseName (the reference's
    * try/except fallback). */
  val curiePrefix: Map[String, String] = Map(
    "UniProt" -> "UniProtKB",
    "Guide to Pharmacology" -> "GTOPDB",
    "ChEBI" -> "CHEBI",
    "REACT" -> "REACT",
    "COMPOUND" -> "KEGG.COMPOUND",
    "PubChem Compound" -> "PUBCHEM.COMPOUND",
    "PubChem Substance" -> "PUBCHEM.COMPOUND",
    "KEGG Glycan" -> "KEGG.GLYCAN",
    "NCBI Entrez Gene" -> "NCBIGene",
    "ClinVar" -> "CLINVAR")

  /** label classes driving the id mapping (loadReactome.py:64-76). */
  val onNodeLabels = Seq("GO_Term", "Species", "ExternalOntology",
    "ReferenceTherapeutic", "ReferenceMolecule", "ReferenceSequence", "Disease")
  val normalizedLabels = Seq("ReactionLikeEvent", "Pathway", "Event",
    "BlackboxEvent", "FailedReaction", "Depolymerisation", "Polymerisation")
  val crossMappingLabels = Seq("EntityWithAccessionedSequence",
    "GenomeEncodedEntity", "SimpleEntity", "Drug", "Complex", "Polymer")

  /** The critical-triples pattern table
    * (reactomeContents_CriticalTriples.csv — public lookup table, needed
    * for behavior parity; the reference file's one duplicated
    * precedingEvent row is dropped since the output is deduplicated). */
  val patterns: Seq[(String, String, String, String)] = Seq(
    ("Pathway", "hasEvent", "ReactionLikeEvent", "Include"),
    ("ReactionLikeEvent", "input", "SimpleEntity", "Include"),
    ("ReactionLikeEvent", "output", "SimpleEntity", "Include"),
    ("ReactionLikeEvent", "precedingEvent", "ReactionLikeEvent", "Include"),
    ("ReactionLikeEvent", "input", "EntityWithAccessionedSequence", "Include"),
    ("ReactionLikeEvent", "output", "EntityWithAccessionedSequence", "Include"),
    ("ReactionLikeEvent", "input", "GenomeEncodedEntity", "Include"),
    ("ReactionLikeEvent", "output", "GenomeEncodedEntity", "Include"),
    ("Pathway", "hasEvent", "Pathway", "Include"),
    ("Pathway", "normalPathway", "Pathway", "Include"),
    ("ReactionLikeEvent", "normalReaction", "ReactionLikeEvent", "Include"),
    ("ReactionLikeEvent", "compartment", "GO_Term", "Include"),
    ("Pathway", "compartment", "GO_Term", "Include"),
    ("Pathway", "goBiologicalProcess", "GO_BiologicalProcess", "Include"),
    ("ReactionLikeEvent", "goBiologicalProcess", "GO_BiologicalProcess", "Include"),
    ("Pathway", "precedingEvent", "Pathway", "Include"),
    ("ReactionLikeEvent", "input", "Polymer", "Include"),
    ("ReactionLikeEvent", "output", "Polymer", "Include"),
    ("ReactionLikeEvent", "input", "Drug", "Include"),
    ("ReactionLikeEvent", "output", "Drug", "Include"),
    ("SimpleEntity", "cellType", "CellType", "Include"),
    ("EntityWithAccessionedSequence", "cellType", "CellType", "Include"),
    ("Drug", "cellType", "CellType", "Include"),
    ("Pathway", "disease", "Disease", "Include/SwitchSO"),
    ("ReactionLikeEvent", "disease", "Disease", "Include/SwitchSO"),
    ("ReactionLikeEvent", "output", "Complex", "Include/Complex"),
    ("ReactionLikeEvent", "input", "Complex", "Include/Complex"),
    ("Complex", "disease", "Disease", "Include/SwitchSO/Complex"),
    ("Regulation", "regulator", "Complex", "Include/Complex"),
    ("Regulation", "regulator", "EntityWithAccessionedSequence", "RDF_edges/Include"),
    ("Regulation", "regulator", "SimpleEntity", "RDF_edges/Include"),
    ("Regulation", "regulator", "Drug", "RDF_edges/Include"),
    ("Regulation", "regulator", "GenomeEncodedEntity", "RDF_edges/Include"))

  /** target-side label set hardcoded in the RDF_edges Cypher
    * (loadReactome.py:184). */
  private val rdfTargetLabels = Seq("Complex", "GenomeEncodedEntity",
    "EntityWithAccessionedSequence")

  private val nodeSchema = StructType(Seq(
    StructField("identity", LongType),
    StructField("labels", ArrayType(StringType)),
    StructField("stId", StringType),
    StructField("displayName", StringType),
    StructField("name", StringType),
    StructField("databaseName", StringType),
    StructField("identifier", StringType),
    StructField("accession", StringType),
    StructField("taxId", StringType),
    StructField("definition", StringType),
    StructField("url", StringType)))

  private val relSchema = StructType(Seq(
    StructField("start", LongType),
    StructField("end", LongType),
    StructField("type", StringType)))

  private val prefLit = typedLit(curiePrefix)
  private def pref(db: Column): Column = coalesce(element_at(prefLit, db), db)
  private def hasAny(labels: Column, names: Seq[String]): Column =
    names.map(n => array_contains(labels, n)).reduce(_ || _)

  /** CURIE for a reference/target node given its own columns
    * (get_reference_entity_mapping, loadReactome.py:283-303 — the same
    * branch order: on-node/cross classes by databaseName, normalized events
    * by stId, bare DatabaseIdentifier pairs by identifier). */
  private def refCurie(labels: Column, stId: Column, db: Column,
                       identifier: Column, accession: Column, taxId: Column): Column =
    when(hasAny(labels, onNodeLabels ++ crossMappingLabels),
      when(array_contains(labels, "Species"), concat(lit("NCBITaxon:"), taxId))
        .when(array_contains(labels, "GO_Term"), concat(pref(db), lit(":"), accession))
        .otherwise(concat(pref(db), lit(":"), identifier)))
      .when(hasAny(labels, normalizedLabels), concat(lit("REACT:"), stId))
      .when(size(labels) === 2 && array_contains(labels, "DatabaseObject") &&
        array_contains(labels, "DatabaseIdentifier"),
        concat(pref(db), lit(":"), identifier))

  /** identity → preferred reference-entity CURIE, from the three lookup
    * queries (loadReactome.py:270-280): referenceEntity links (non-Pathway
    * sources), crossReference links (non-Pathway/PhysicalEntity/Event),
    * and Pathway→GO_Term links whose displayNames match after
    * lowercase/dash normalization. Priority = query order, ties broken by
    * CURIE for determinism. */
  private def referenceEntityMap(nodes: DataFrame, rels: DataFrame): DataFrame = {
    val a = nodes.select(col("identity").as("a_id"), col("labels").as("a_labels"),
      col("displayName").as("a_dn"))
    val b = nodes.select(col("identity").as("b_id"), col("labels").as("b_labels"),
      col("stId").as("b_stId"), col("databaseName").as("b_db"),
      col("identifier").as("b_ident"), col("accession").as("b_acc"),
      col("taxId").as("b_tax"), col("displayName").as("b_dn"))
    def pairs(relType: String): DataFrame = rels.filter(col("type") === relType)
      .select(col("start").as("a_id"), col("end").as("b_id"))
      .join(a, "a_id").join(b, "b_id")
    val q1 = pairs("referenceEntity")
      .filter(!array_contains(col("a_labels"), "Pathway"))
      .withColumn("priority", lit(1))
    val q2 = pairs("crossReference")
      .filter(!array_contains(col("a_labels"), "Pathway") &&
        !array_contains(col("a_labels"), "PhysicalEntity") &&
        !array_contains(col("a_labels"), "Event"))
      .withColumn("priority", lit(2))
    def norm(c: Column) = regexp_replace(lower(c), "-", " ")
    val q3 = pairs("goBiologicalProcess")
      .filter(array_contains(col("a_labels"), "Pathway") &&
        array_contains(col("b_labels"), "GO_Term") &&
        norm(col("a_dn")) === norm(col("b_dn")))
      .withColumn("priority", lit(3))
    q1.unionByName(q2).unionByName(q3)
      .withColumn("curie", refCurie(col("b_labels"), col("b_stId"), col("b_db"),
        col("b_ident"), col("b_acc"), col("b_tax")))
      .filter(col("curie").isNotNull)
      .groupBy(col("a_id").as("identity"))
      .agg(min_by(col("curie"), struct(col("priority"), col("curie"))).as("ref_curie"))
  }

  def parse(spark: SparkSession, nodesPath: String, relsPath: String): ExtractedGraph = {
    val nodes = spark.read.schema(nodeSchema).json(nodesPath)
    val rels = spark.read.schema(relSchema).json(relsPath)
    val labelIdx = nodes.select(col("identity").as("lid"), explode(col("labels")).as("label"))

    // ---- node CURIE mapping (process_node_from_neo4j, loadReactome.py:346-383)
    val reactId = concat(lit("REACT:"), col("stId"))
    val nodeIdCol =
      when(hasAny(col("labels"), onNodeLabels),
        when(array_contains(col("labels"), "Species"), concat(lit("NCBITaxon:"), col("taxId")))
          .when(array_contains(col("labels"), "GO_Term"),
            concat(pref(col("databaseName")), lit(":"), col("accession")))
          .otherwise(concat(pref(col("databaseName")), lit(":"), col("identifier"))))
        .when(hasAny(col("labels"), normalizedLabels),
          // Pathways prefer their exactly-matching GO process id (:365-371)
          when(array_contains(col("labels"), "Pathway"),
            coalesce(col("ref_curie"), reactId)).otherwise(reactId))
        .when(hasAny(col("labels"), crossMappingLabels),
          coalesce(col("ref_curie"), reactId))
    val mapped = nodes.join(referenceEntityMap(nodes, rels), Seq("identity"), "left")
      .select(col("identity"), nodeIdCol.as("node_id"),
        coalesce(col("displayName"), lit("")).as("node_name"),
        when(array_contains(col("labels"), "Complex"),
          array(lit("biolink:NamedThing"), lit("biolink:MacromolecularComplex")))
          .otherwise(array(lit("biolink:NamedThing"))).as("category"),
        col("definition"), col("url"), col("name").as("cname"))

    // ---- pattern matches, one frame per decision family, all shaped
    // (subj_identity, obj_identity, rel_type, ctx_identity, regulation)
    val pats = spark.createDataFrame(patterns).toDF("subj", "pred", "obj", "decision")

    val simplePats = broadcast(pats.filter(col("decision").isin("Include", "Include/SwitchSO")))
    val simple = rels
      .join(simplePats, col("type") === col("pred"))
      .join(labelIdx.as("ls"), col("start") === col("ls.lid") && col("ls.label") === col("subj"))
      .join(labelIdx.as("lo"), col("end") === col("lo.lid") && col("lo.label") === col("obj"))
      .select(
        when(col("decision") === "Include", col("start")).otherwise(col("end")).as("subj_identity"),
        when(col("decision") === "Include", col("end")).otherwise(col("start")).as("obj_identity"),
        col("type").as("rel_type"),
        lit(null).cast("long").as("ctx_identity"),
        lit(null).cast("string").as("regulation"))

    val complexPats = broadcast(pats.filter(
      col("decision").isin("Include/Complex", "Include/SwitchSO/Complex")))
    val comps = rels.filter(col("type") === "hasComponent")
      .select(col("start").as("comp_owner"), col("end").as("comp"))
    val complexMatches = rels
      .join(complexPats, col("type") === col("pred"))
      .join(labelIdx.as("lc"), col("start") === col("lc.lid") && col("lc.label") === col("subj"))
      .join(labelIdx.as("lt"), col("end") === col("lt.lid") && col("lt.label") === col("obj"))
      .join(comps, col("start") === col("comp_owner"))
      .select(
        when(col("decision") === "Include/Complex", col("comp")).otherwise(col("end")).as("subj_identity"),
        when(col("decision") === "Include/Complex", col("end")).otherwise(col("comp")).as("obj_identity"),
        lit("hasComponent").as("rel_type"),
        col("start").as("ctx_identity"),
        lit(null).cast("string").as("regulation"))

    // regulatedBy / output are undirected in the reference Cypher
    def undirected(relType: String): DataFrame = {
      val r = rels.filter(col("type") === relType)
      r.select(col("start").as("u"), col("end").as("v"))
        .union(r.select(col("end").as("u"), col("start").as("v")))
    }
    val rdfALabels = broadcast(pats.filter(col("decision") === "RDF_edges/Include")
      .select(col("obj").as("label")).distinct())
    val regulations = nodes.filter(array_contains(col("labels"), "Regulation"))
      .select(col("identity").as("d_id"),
        when(exists(col("labels"), l => lower(l).contains("positive")), "positive")
          .when(exists(col("labels"), l => lower(l).contains("negative")), "negative")
          .as("regulation"))
    val expressionRle = nodes.filter(array_contains(col("labels"), "ReactionLikeEvent") &&
      col("displayName").contains("Expression of"))
      .select(col("identity").as("c_id"))
    val rdf = rels.filter(col("type") === "regulator")
      .select(col("start").as("d_id"), col("end").as("a_id"))
      .join(labelIdx.select(col("lid").as("a_id"), col("label")), Seq("a_id"))
      .join(rdfALabels, Seq("label"))
      .join(regulations, Seq("d_id"))
      // neither-positive-nor-negative regulations emit nothing (:322-335)
      .filter(col("regulation").isNotNull)
      .join(undirected("regulatedBy").select(col("u").as("d_id"), col("v").as("c_id")), Seq("d_id"))
      .join(expressionRle, Seq("c_id"))
      .join(undirected("output").select(col("u").as("c_id"), col("v").as("b_id")), Seq("c_id"))
      .join(labelIdx.select(col("lid").as("b_id"), col("label").as("b_label")), Seq("b_id"))
      .filter(col("b_label").isin(rdfTargetLabels: _*))
      .select(col("a_id").as("subj_identity"), col("b_id").as("obj_identity"),
        lit("regulator").as("rel_type"), lit(null).cast("long").as("ctx_identity"),
        col("regulation"))

    val matches = simple.unionByName(complexMatches).unionByName(rdf)
      .dropDuplicates("subj_identity", "obj_identity", "rel_type", "ctx_identity", "regulation")

    // ---- attach CURIEs + node payloads; unmappable endpoints drop the
    // record (the reference's skipped_record_counter path)
    val withIds = matches
      .join(mapped.select(col("identity").as("subj_identity"), col("node_id").as("subject"),
        col("node_name").as("s_name"), col("category").as("s_cat"),
        col("definition").as("s_def"), col("url").as("s_url")), Seq("subj_identity"))
      .join(mapped.select(col("identity").as("obj_identity"), col("node_id").as("object"),
        col("node_name").as("o_name"), col("category").as("o_cat"),
        col("definition").as("o_def"), col("url").as("o_url")), Seq("obj_identity"))
      .join(mapped.select(col("identity").as("ctx_identity"),
        col("cname").as("complex_context")), Seq("ctx_identity"), "left")
      .filter(col("subject").isNotNull && col("object").isNotNull)

    val predLit = typedLit(predicateMap)
    val edges = withIds
      .withColumn("predicate", element_at(predLit, col("rel_type")))
      .filter(col("predicate").isNotNull)
      .select(col("subject"), col("predicate"), col("object"),
        lit(provenance).as("primary_knowledge_source"),
        lit("knowledge_assertion").as("knowledge_level"),
        lit("manual_agent").as("agent_type"),
        when(col("regulation").isNotNull, lit("biolink:causes")).as("qualified_predicate"),
        when(col("regulation").isNotNull, lit("expression")).as("object_aspect_qualifier"),
        when(col("regulation") === "positive", "increased")
          .when(col("regulation") === "negative", "decreased")
          .as("object_direction_qualifier"),
        col("complex_context"))
      .dropDuplicates()

    // Distinct internal Reactome entities commonly share one CURIE (the
    // same protein in different compartments maps to one UniProt reference
    // entity) with different names/definitions; dropDuplicates("id") would
    // keep a partition-dependent row. Pick the survivor deterministically:
    // lexicographic min over the payload, mirroring ref_curie's min_by.
    val outNodes = withIds
      .select(col("subject").as("id"), col("s_name").as("name"), col("s_cat").as("category"),
        col("s_def").as("definition"), col("s_url").as("url"))
      .union(withIds.select(col("object"), col("o_name"), col("o_cat"),
        col("o_def"), col("o_url")))
      .groupBy(col("id"))
      .agg(min(struct(col("name"), col("category"), col("definition"), col("url"))).as("p"))
      .select(col("id"), col("p.name"), col("p.category"), col("p.definition"), col("p.url"))
    ExtractedGraph(outNodes, edges)
  }
}
