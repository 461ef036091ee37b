package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.SqlSource

/** PHAROS (TCRD) parser — three SQL extractions
  * (parsers/PHAROS/src/loadPHAROS.py:15-432):
  *
  *  - gene→disease: UMLS/ORPHANET/OMIM curie fixups, per-dtype infores +
  *    KL/AT, DrugCentral rows become biolink:target_for, others the
  *    WIKIDATA genetic-association property, TIGA rows skipped, score
  *    carried when present;
  *  - drug activity and compound activity: ChEMBL / GtoPdb prefix map,
  *    action/act type snakified through the DGIDB predicate mapping
  *    (unmapped → broken parse), pAffinity props, '|'-split PMIDs;
  *  - names sanitized to ASCII ('?' for non-ASCII, sanitize_name :431).
  */
object Pharos {

  val provenance = "infores:pharos"
  val geneticAssociationPredicate = "WIKIDATA_PROPERTY:P2293"
  val targetForPredicate = "biolink:target_for"

  val inforesMapping: Map[String, String] = Map(
    "CTD" -> "infores:ctd",
    "DisGeNET" -> "infores:disgenet",
    "DrugCentral Indication" -> "infores:drugcentral",
    "eRAM" -> "infores:eram",
    "JensenLab Experiment TIGA" -> "infores:tiga",
    "JensenLab Knowledge AmyCo" -> "infores:diseases",
    "JensenLab Knowledge MedlinePlus" -> "infores:diseases",
    "JensenLab Knowledge UniProtKB-KW" -> "infores:diseases",
    "JensenLab Text Mining" -> "infores:diseases",
    "Monarch" -> "infores:monarchinitiative",
    "UniProt Disease" -> "infores:uniprot")

  /** dtype → (knowledge_level, agent_type); unknown → not_provided pair. */
  val klAtLookup: Map[String, (String, String)] = Map(
    "CTD" -> (Biolink.Prediction, Biolink.ManualAgent),
    "DisGeNET" -> (Biolink.NotProvided, Biolink.NotProvided),
    "DrugCentral Indication" -> (Biolink.KnowledgeAssertion, Biolink.ManualAgent),
    "eRAM" -> (Biolink.NotProvided, Biolink.NotProvided),
    "JensenLab Experiment TIGA" -> (Biolink.Prediction, Biolink.AutomatedAgent),
    "JensenLab Knowledge AmyCo" -> (Biolink.KnowledgeAssertion, Biolink.ManualAgent),
    "JensenLab Knowledge MedlinePlus" -> (Biolink.KnowledgeAssertion, Biolink.ManualAgent),
    "JensenLab Knowledge UniProtKB-KW" -> (Biolink.KnowledgeAssertion, Biolink.ManualValidationOfAutomatedAgent),
    "JensenLab Text Mining" -> (Biolink.NotProvided, "text_mining_agent"),
    "Monarch" -> (Biolink.NotProvided, Biolink.NotProvided),
    "UniProt Disease" -> (Biolink.KnowledgeAssertion, Biolink.ManualAgent))

  val geneToDiseaseQuery: String =
    """SELECT DISTINCT x.value, d.did, d.name, p.sym, d.dtype, d.score
       FROM disease d
       JOIN xref x ON x.protein_id = d.protein_id
       JOIN protein p ON p.id = x.protein_id
       WHERE x.xtype = 'HGNC'
       AND d.dtype <> 'Expression Atlas'
       AND d.did NOT LIKE 'NCBIGene%'
       AND d.did NOT LIKE 'AmyCo%'
       AND d.did NOT LIKE 'ENSP%'"""

  val geneToDrugActivityQuery: String =
    """SELECT DISTINCT x.value, da.drug, da.cmpd_chemblid AS cid, 'ChEMBL' AS id_src, p.sym,
       da.act_value AS affinity, da.act_type AS affinity_parameter, da.action_type AS pred, '' AS dtype
       FROM xref x
       JOIN drug_activity da ON x.protein_id = da.target_id
       JOIN protein p ON p.id = x.protein_id
       WHERE da.cmpd_chemblid IS NOT NULL AND x.xtype = 'HGNC'"""

  val geneToCmpdActivityQuery: String =
    """SELECT DISTINCT x.value, ca.cmpd_name_in_src AS drug, ca.cmpd_id_in_src AS cid, catype AS id_src,
       ca.act_value AS affinity, ca.act_type AS affinity_parameter, ca.act_type AS pred, p.sym,
       ca.pubmed_ids AS pubmed_ids, '' AS dtype
       FROM xref x
       JOIN cmpd_activity ca ON x.protein_id = ca.target_id
       JOIN protein p ON p.id = x.protein_id
       WHERE x.xtype = 'HGNC' AND ca.cmpd_name_in_src IS NOT NULL
       AND ca.cmpd_name_in_src <> 'NA' AND ca.cmpd_name_in_src NOT LIKE 'US%'"""

  private def mapLookup(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  /** sanitize_name: non-ASCII characters become '?'. */
  def sanitizeName(c: Column): Column = regexp_replace(c, "[^\\x00-\\x7F]", "?")

  private def up(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c.toLowerCase))

  /** drug/cmpd id: prefix by source, CHEMBL ids carry the prefix in the
    * local part (loadPHAROS.py:247,310 prefixmap). */
  private def compoundId(idSrc: Column, cid: Column): Column =
    when(idSrc === "ChEMBL",
      concat(lit("CHEMBL.COMPOUND:CHEMBL"), regexp_replace(cid, "CHEMBL", "")))
      .when(idSrc === "Guide to Pharmacology", concat(lit("GTOPDB:"), cid))

  private def snakePred(pred: Column): Column =
    when(pred.isNotNull && length(pred) > 1, DrugCentral.snakify(pred))
      .otherwise("interacts_with")

  private val edgeSchema = Seq("subject", "predicate", "object",
    "primary_knowledge_source", "aggregator_knowledge_source", "score",
    "affinity", "affinity_parameter", "publications",
    "knowledge_level", "agent_type")

  def parse(spark: SparkSession, jdbcUrl: String): ExtractedGraph = {
    val disease = up(SqlSource.readQuery(spark, jdbcUrl, geneToDiseaseQuery))
    val drugAct = up(SqlSource.readQuery(spark, jdbcUrl, geneToDrugActivityQuery))
    val cmpdAct = up(SqlSource.readQuery(spark, jdbcUrl, geneToCmpdActivityQuery))

    // gene → disease
    val did = col("did")
    val diseaseId = when(did.rlike("^C\\d+$"), concat(lit("UMLS:"), did))
      .when(did.startsWith("Orphanet:"),
        concat(lit("ORPHANET:"), element_at(split(did, ":"), 2)))
      .when(did.startsWith("MIM"), concat(lit("O"), did))
      .otherwise(did)
    val dtypeProv = mapLookup(col("dtype"), inforesMapping)
    val dKl = klAtLookup.foldLeft(lit(Biolink.NotProvided)) {
      case (acc, (k, (kl, _))) => when(col("dtype") === k, lit(kl)).otherwise(acc) }
    val dAt = klAtLookup.foldLeft(lit(Biolink.NotProvided)) {
      case (acc, (k, (_, at))) => when(col("dtype") === k, lit(at)).otherwise(acc) }
    val diseaseRows = disease
      .filter(did.isNotNull)
      .withColumn("_disease_id", diseaseId)
      .filter(col("_disease_id") =!= col("value")) // self-reference guard
      .withColumn("_prov", dtypeProv)
      .filter(col("_prov").isNull || (col("_prov") =!= "infores:tiga"))
    val diseaseEdges = diseaseRows.select(
      col("value").as(Biolink.Subject),
      when(col("_prov") === "infores:drugcentral", targetForPredicate)
        .otherwise(geneticAssociationPredicate).as(Biolink.Predicate),
      col("_disease_id").as(Biolink.Object_),
      coalesce(col("_prov"), lit(provenance)).as(Biolink.PrimaryKnowledgeSource),
      when(col("_prov").isNotNull, array(lit(provenance)))
        .otherwise(lit(null).cast("array<string>")).as(Biolink.AggregatorKnowledgeSources),
      col("score").cast("double").as("score"),
      lit(null).cast("double").as("affinity"),
      lit(null).cast("string").as("affinity_parameter"),
      lit(null).cast("array<string>").as(Biolink.Publications),
      dKl.as(Biolink.KnowledgeLevel), dAt.as(Biolink.AgentType))

    // drug / compound activity (PHAROS_KL_AT for edges without upstream dtype)
    def activityEdges(df: DataFrame, hasPubs: Boolean): DataFrame = {
      val pubs =
        if (hasPubs)
          when(col("pubmed_ids").isNotNull,
            transform(split(col("pubmed_ids"), "\\|"), p => concat(lit("PMID:"), p)))
        else lit(null).cast("array<string>")
      // hoisted snakify: inlining it per map branch explodes codegen
      df.withColumn("_snake", snakePred(col("pred"))).select(
        compoundId(col("id_src"), col("cid")).as(Biolink.Subject),
        mapLookup(col("_snake"), DrugCentral.dgidbPredicateMapping).as(Biolink.Predicate),
        col("value").as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        lit(null).cast("array<string>").as(Biolink.AggregatorKnowledgeSources),
        lit(null).cast("double").as("score"),
        when(col("affinity").isNotNull, col("affinity").cast("double")).as("affinity"),
        when(col("affinity_parameter").isNotNull && col("affinity_parameter") =!= "",
          concat(lit("p"), col("affinity_parameter"))).as("affinity_parameter"),
        pubs.as(Biolink.Publications),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit(Biolink.ManualAgent).as(Biolink.AgentType))
    }
    val drugEdges = activityEdges(drugAct, hasPubs = false)
    val cmpdEdges = activityEdges(cmpdAct, hasPubs = true)

    val unmapped = drugEdges.unionByName(cmpdEdges)
      .filter(col(Biolink.Predicate).isNull).count()
    require(unmapped == 0, s"$unmapped activity types have no DGIDB predicate mapping")

    val edges = diseaseEdges.unionByName(drugEdges).unionByName(cmpdEdges)

    val geneNodes = disease.select(col("value").as("id"), sanitizeName(col("sym")).as("name"),
        array(lit("biolink:Gene")).as("category"))
      .unionByName(drugAct.select(col("value").as("id"), sanitizeName(col("sym")).as("name"),
        array(lit("biolink:Gene")).as("category")))
      .unionByName(cmpdAct.select(col("value").as("id"), sanitizeName(col("sym")).as("name"),
        array(lit("biolink:Gene")).as("category")))
    val diseaseNodes = diseaseRows.select(col("_disease_id").as("id"),
      sanitizeName(col("name")).as("name"),
      array(lit("biolink:DiseaseOrPhenotypicFeature")).as("category"))
    val compoundNodes = drugAct.select(compoundId(col("id_src"), col("cid")).as("id"),
        sanitizeName(col("drug")).as("name"), array(lit(Biolink.NamedThing)).as("category"))
      .unionByName(cmpdAct.select(compoundId(col("id_src"), col("cid")).as("id"),
        sanitizeName(col("drug")).as("name"), array(lit(Biolink.NamedThing)).as("category")))

    val nodes = geneNodes.unionByName(diseaseNodes).unionByName(compoundNodes)
      .dropDuplicates("id")
    ExtractedGraph(nodes, edges)
  }
}
