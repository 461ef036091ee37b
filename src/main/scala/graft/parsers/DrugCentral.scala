package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.SqlSource

/** DrugCentral parser — the reference's flagship SQL-sourced loader
  * (parsers/drugcentral/src/loaddrugcentral.py:23-213,
  * orion/predicates.py:7-54, orion/utils.py:487-491 snakify).
  *
  * Three relational extractions over the DrugCentral database, all via
  * S4 `SqlSource` (JDBC; tests stand up embedded Derby):
  *  - omop_relationship → chemical-phenotype edges, relationship_name
  *    mapped through omop_relationmap, excluded semantic types filtered
  *    in the pushed-down SQL;
  *  - faers (llr > threshold, drug_ae > 25) → has_adverse_event with the
  *    FAERS llr as an edge prop, primary infores:faers + drugcentral
  *    aggregator;
  *  - act_table_full ⋈ td2tc ⋈ target_component → bioactivity edges:
  *    action_type (else act_type, else interacts_with) snakified through
  *    the DGIDB predicate mapping (unmapped → hard failure, the
  *    reference's SourceDataBrokenError), affinity (pXXX) props, PMID
  *    publications from literature URLs, act_source → knowledge source.
  */
object DrugCentral {

  val provenance = "infores:drugcentral"
  val adverseEventPredicate = "biolink:has_adverse_event"

  val omopRelationMap: Map[String, String] = Map(
    "off-label use" -> "biolink:applied_to_treat",
    "reduce risk" -> "biolink:preventative_for_condition",
    "contraindication" -> "NCIT:C37933",
    "symptomatic treatment" -> "RO:0002606",
    "indication" -> "RO:0002606",
    "diagnosis" -> "DrugCentral:5271")

  val excludedStys: Seq[String] = Seq(
    "T002", "T007", "T034", "T040", "T042", "T058", "T059", "T060", "T061",
    "T109", "T121", "T130", "T131", "T167")

  val actTypeToKnowledgeSource: Map[String, String] = Map(
    "IUPHAR" -> "infores:gtopdb",
    "KEGG DRUG" -> "infores:kegg",
    "PDSP" -> "infores:pdsp",
    "CHEMBL" -> "infores:chembl",
    "DRUGBANK" -> "infores:drugbank")

  /** DGIDB/DrugCentral activity → predicate curie (orion/predicates.py:7-54). */
  val dgidbPredicateMapping: Map[String, String] = Map(
    "ac50" -> "DGIdb:activator", "activator" -> "DGIdb:activator",
    "agonist" -> "DGIdb:agonist", "allosteric_antagonist" -> "DGIdb:antagonist",
    "allosteric_modulator" -> "DGIdb:modulator", "antagonist" -> "DGIdb:antagonist",
    "antibody" -> "RO:0002436", "antibody_binding" -> "RO:0002436",
    "antisense_inhibitor" -> "DGIdb:inhibitor", "app_ki" -> "RO:0002434",
    "app_km" -> "RO:0002434", "binding_agent" -> "RO:0002436",
    "blocker" -> "DGIdb:blocker", "channel_blocker" -> "DGIdb:channel_blocker",
    "ec50" -> "DGIdb:agonist", "ed50" -> "RO:0002434",
    "gating_inhibitor" -> "DGIdb:gating_inhibitor", "gi50" -> "DGIdb:Inhibitor",
    "ic50" -> "DGIdb:inhibitor", "inhibitor" -> "DGIdb:inhibitor",
    "interacts_with" -> "RO:0002434", "inverse_agonist" -> "DGIdb:inverse_agonist",
    "ka" -> "RO:0002436", "kact" -> "RO:0002436", "kb" -> "RO:0002436",
    "kd" -> "RO:0002436", "kd1" -> "RO:0002436", "ki" -> "DGIdb:inhibitor",
    "km" -> "RO:0002436", "ks" -> "RO:0002436", "modulator" -> "DGIdb:modulator",
    "mic" -> "RO:0002434", "mpc" -> "RO:0002434",
    "negative_modulator" -> "CHEMBL.MECHANISM:negative_modulator",
    "negative_allosteric_modulator" -> "CHEMBL.MECHANISM:negative_modulator",
    "opener" -> "CHEMBL.MECHANISM:opener", "other" -> "DGIdb:other",
    "partial_agonist" -> "DGIdb:partial_agonist", "pa2" -> "RO:0002434",
    "pharmacological_chaperone" -> "DGIdb:chaperone",
    "positive_allosteric_modulator" -> "CHEMBL.MECHANISM:positive_modulator",
    "positive_modulator" -> "CHEMBL.MECHANISM:positive_modulator",
    "releasing_agent" -> "CHEMBL.MECHANISM:releasing_agent",
    "substrate" -> "CHEMBL.MECHANISM:substrate", "xc50" -> "RO:0002436")

  /** snakify (utils.py:487-491): lowercase, ','/'-' → '_', whitespace → '_'. */
  def snakify(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "[,-]", "_"), "\\s+", "_")

  private def mapLookup(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  def chemicalPhenotypeQuery: String = {
    val excluded = excludedStys.map(s => s"'$s'").mkString(", ")
    s"""SELECT struct_id, relationship_name, umls_cui, cui_semantic_type
        FROM omop_relationship
        WHERE umls_cui IS NOT NULL
        AND (cui_semantic_type IS NULL OR cui_semantic_type NOT IN ($excluded))"""
  }

  val faersQuery: String =
    "SELECT struct_id, meddra_code, llr FROM faers WHERE llr > llr_threshold AND drug_ae > 25"

  val bioactivityQuery: String =
    """SELECT a.struct_id AS struct_id, a.act_value AS act_value, a.act_unit AS act_unit,
       a.act_type AS act_type, a.act_source AS act_source, a.act_source_url AS act_source_url,
       a.action_type AS action_type, dc.component_id AS component_id, c.accession AS accession
       FROM act_table_full a, td2tc dc, target_component c
       WHERE a.target_id = dc.target_id AND dc.component_id = c.id"""

  private def up(df: DataFrame): DataFrame = // Derby upper-cases result columns
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c.toLowerCase))

  def parse(spark: SparkSession, jdbcUrl: String): ExtractedGraph = {
    val chemPheno = up(SqlSource.readQuery(spark, jdbcUrl, chemicalPhenotypeQuery))
    val faers = up(SqlSource.readQuery(spark, jdbcUrl, faersQuery))
    val bioact = up(SqlSource.readQuery(spark, jdbcUrl, bioactivityQuery))

    val chemPhenoEdges = chemPheno.select(
      concat(lit("DrugCentral:"), col("struct_id")).as(Biolink.Subject),
      mapLookup(col("relationship_name"), omopRelationMap).as(Biolink.Predicate),
      concat(lit("UMLS:"), col("umls_cui")).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(null).cast("array<string>").as(Biolink.AggregatorKnowledgeSources),
      lit(null).cast("double").as("FAERS_llr"),
      lit(null).cast("double").as("affinity"),
      lit(null).cast("string").as("affinity_parameter"),
      lit(null).cast("array<string>").as(Biolink.Publications),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val faersEdges = faers.select(
      concat(lit("DrugCentral:"), col("struct_id")).as(Biolink.Subject),
      lit(adverseEventPredicate).as(Biolink.Predicate),
      concat(lit("MEDDRA:"), col("meddra_code")).as(Biolink.Object_),
      lit("infores:faers").as(Biolink.PrimaryKnowledgeSource),
      array(lit(provenance)).as(Biolink.AggregatorKnowledgeSources),
      col("llr").cast("double").as("FAERS_llr"),
      lit(null).cast("double").as("affinity"),
      lit(null).cast("string").as("affinity_parameter"),
      lit(null).cast("array<string>").as(Biolink.Publications),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    // hoisted: inlining the snakify per map branch explodes codegen
    val actionType = col("_snake")
    val pks = mapLookup(col("act_source"), actTypeToKnowledgeSource)
    val pubs = when(
      (col("act_source") === "SCIENTIFIC LITERATURE") &&
        col("act_source_url").startsWith("http://www.ncbi.nlm.nih.gov/pubmed"),
      array(concat(lit("PMID:"), element_at(split(col("act_source_url"), "/"), -1))))
    val bioactEdges = bioact
      .withColumn("_snake", snakify(coalesce(
        when(col("action_type") =!= "", col("action_type")),
        when(col("act_type") =!= "", col("act_type")),
        lit("interacts_with"))))
      .select(
      concat(lit("DrugCentral:"), col("struct_id")).as(Biolink.Subject),
      mapLookup(actionType, dgidbPredicateMapping).as(Biolink.Predicate),
      concat(lit("UniProtKB:"), col("accession")).as(Biolink.Object_),
      coalesce(pks, lit(provenance)).as(Biolink.PrimaryKnowledgeSource),
      when(pks.isNotNull, array(lit(provenance)))
        .otherwise(lit(null).cast("array<string>")).as(Biolink.AggregatorKnowledgeSources),
      lit(null).cast("double").as("FAERS_llr"),
      when(col("act_type").isNotNull, col("act_value").cast("double")).as("affinity"),
      when(col("act_type").isNotNull, concat(lit("p"), col("act_type"))).as("affinity_parameter"),
      pubs.as(Biolink.Publications),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    // unmapped predicate = broken parser (SourceDataBrokenError semantics)
    val unmappedOmop = chemPhenoEdges.filter(col(Biolink.Predicate).isNull).count()
    val unmappedAct = bioactEdges.filter(col(Biolink.Predicate).isNull).count()
    require(unmappedOmop == 0, s"$unmappedOmop omop relationship_name values have no predicate mapping")
    require(unmappedAct == 0, s"$unmappedAct bioactivity action types have no DGIDB predicate mapping")

    val edges = chemPhenoEdges.unionByName(faersEdges).unionByName(bioactEdges)
    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
