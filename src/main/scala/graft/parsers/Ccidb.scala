package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** CCIDB (cell-cell interaction database) parser.
  *
  * Reference (parsers/CCIDB/src/loadCCIDB.py:33-325): the curated xlsx
  * (consumed here as its CSV export — the spreadsheet codec is a
  * fetch-time concern) joins two curated mapping tables shipped with the
  * parser:
  *  - gene labels → curies ("genes in CCIDB" → ID), applied to
  *    source_gene, target_gene and each comma-split effector;
  *  - combined cell terms "<cell>: <literature cell>" → node id +
  *    specialization/context/form_or_variant qualifiers.
  * Rows with an unmapped source/target gene or cell term drop. Each row
  * fans out to up to six edge shapes: gene–gene
  * directly_physically_interacts_with, gene→cell-term and effector→cell
  * "affects" edges qualified by the zip of phenotype×mode_of_action and
  * effector×function lists (singleton lists broadcast to match length;
  * irreconcilable phenotype/mode lengths drop the row, irreconcilable
  * effector/function lengths drop only the effector edges). */
object Ccidb {

  val provenance = "infores:ccidb"

  private def sanitize(c: Column): Column =
    trim(regexp_replace(coalesce(c, lit("")), "\\u00a0", " "))

  /** Reference length reconciliation for phenotype×mode
    * (loadCCIDB.py:152-160): broadcast a singleton mode list, or truncate
    * the modes to the first when the phenotype list is a singleton; null
    * (→ row drop) when lengths still differ. */
  private def reconcilePhenoModes(phenos: Column, modes: Column): Column =
    when(size(phenos) === size(modes), modes)
      .when(size(modes) === 1, transform(phenos, _ => element_at(modes, 1)))
      .when(size(phenos) === 1, slice(modes, 1, 1))

  /** Effector×function reconciliation (loadCCIDB.py:135-147): only the
    * singleton broadcast applies; null (→ effector edges drop, row kept)
    * when lengths still differ. */
  private def reconcileEffFuncs(effs: Column, funcs: Column): Column =
    when(size(effs) === size(funcs), funcs)
      .when(size(funcs) === 1, transform(effs, _ => element_at(funcs, 1)))

  /** CSV-export entry (the spreadsheet codec handled at fetch time). */
  def parse(spark: SparkSession, dataCsv: String, geneMappingCsv: String,
            termMappingCsv: String): ExtractedGraph =
    parseFrame(spark,
      spark.read.option("header", "true").option("multiLine", "true").csv(dataCsv),
      geneMappingCsv, termMappingCsv)

  /** Native xlsx entry: reads 'Sheet1' exactly as the reference's
    * pd.read_excel (loadCCIDB.py:115) through the pure-JDK
    * [[graft.sources.Xlsx]] reader — same null-for-empty contract as
    * the CSV export, so downstream logic is shared verbatim. */
  def parseXlsx(spark: SparkSession, dataXlsx: String, geneMappingCsv: String,
                termMappingCsv: String): ExtractedGraph =
    parseFrame(spark, graft.sources.Xlsx.readSheet(spark, dataXlsx, "Sheet1"),
      geneMappingCsv, termMappingCsv)

  private def parseFrame(spark: SparkSession, raw: DataFrame, geneMappingCsv: String,
            termMappingCsv: String): ExtractedGraph = {
    val genes = broadcast(spark.read.option("header", "true").csv(geneMappingCsv)
      .select(col("genes in CCIDB").as("gene_label"), col("ID").as("gene_id"))
      .filter(col("gene_id").isNotNull && col("gene_id") =!= ""))
    val terms = broadcast(spark.read.option("header", "true").csv(termMappingCsv)
      .select(col("Combined").as("combined"), col("Node ID").as("term_id"),
        col("specialization qualifier").as("spec_q"),
        col("context qualifier").as("ctx_q"),
        col("form or variant qualifier").as("form_q"))
      .filter(col("term_id").isNotNull && col("term_id") =!= ""))

    val base0 = raw
      .withColumn("_pmid", concat(lit("PMID:"), sanitize(col("PMID"))))
      .withColumn("_src_combined", concat(sanitize(col("source_cell")), lit(": "),
        sanitize(col("literature_source_cell"))))
      .withColumn("_tgt_combined", concat(sanitize(col("target_cell")), lit(": "),
        sanitize(col("literature_target_cell"))))
      .join(genes.withColumnRenamed("gene_id", "src_gene_id"),
        sanitize(col("source_gene")) === col("gene_label")).drop("gene_label")
      .join(genes.withColumnRenamed("gene_id", "tgt_gene_id"),
        sanitize(col("target_gene")) === col("gene_label")).drop("gene_label")
      .join(terms.select(col("combined"), col("term_id").as("src_term_id"),
        col("spec_q").as("src_spec_q"), col("ctx_q").as("src_ctx_q")),
        col("_src_combined") === col("combined")).drop("combined")
      .join(terms.select(col("combined"), col("term_id").as("tgt_term_id"),
        col("spec_q").as("tgt_spec_q"), col("ctx_q").as("tgt_ctx_q"),
        col("form_q").as("tgt_form_q")),
        col("_tgt_combined") === col("combined")).drop("combined")

    val phenos = transform(split(sanitize(col("phenotype")), ","), p => lower(trim(p)))
    val modes0 = transform(split(sanitize(col("mode_of_action")), ","), m => lower(trim(m)))
    val effs = transform(split(sanitize(col("effector")), ","), e => trim(e))
    val funcs0 = transform(split(sanitize(col("effector's_function")), ","),
      f => lower(trim(f)))

    val srcCtx = coalesce(col("src_ctx_q"), lit(""))
    val tgtCtx = coalesce(col("tgt_ctx_q"), lit(""))
    val diseaseCtx = when(srcCtx =!= "" && tgtCtx === "", srcCtx)
      .when(tgtCtx =!= "" && srcCtx === "", tgtCtx)
      .otherwise(srcCtx)

    val base = base0
      .withColumn("_phenos", phenos)
      .withColumn("_modes", reconcilePhenoModes(phenos, modes0))
      .filter(col("_modes").isNotNull) // irreconcilable phenotype/mode → row drop
      .withColumn("_pm", arrays_zip(col("_phenos"), col("_modes")))
      .withColumn("_effs", effs)
      .withColumn("_funcs", reconcileEffFuncs(effs, funcs0))
      .withColumn("_disease_ctx", diseaseCtx)
      .localCheckpoint()

    def emptyToNull(c: Column): Column = when(c =!= "", c)

    val common = Seq(
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType),
      array(col("_pmid")).as(Biolink.Publications),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource))

    // edge 1: source gene —directly_physically_interacts_with→ target gene
    val e1 = base.select(Seq(
      col("src_gene_id").as(Biolink.Subject),
      lit("biolink:directly_physically_interacts_with").as(Biolink.Predicate),
      col("tgt_gene_id").as(Biolink.Object_),
      lit(null).cast("string").as("qualified_predicate"),
      lit(null).cast("string").as("object_aspect_qualifier"),
      lit(null).cast("string").as("causal_mechanism_qualifier"),
      lit(null).cast("string").as("subject_context_qualifier"),
      lit(null).cast("string").as("anatomical_context_qualifier"),
      emptyToNull(col("src_spec_q")).as("subject_specialization_qualifier"),
      emptyToNull(col("tgt_spec_q")).as("object_specialization_qualifier"),
      emptyToNull(col("_disease_ctx")).as("disease_context_qualifier"),
      lit(null).cast("string").as("object_form_or_variant_qualifier")) ++ common: _*)

    // edges 2+3: per phenotype×mode, both genes affect the target cell term
    def phenoEdge(subjectId: Column, ctxGene: Column, anatTerm: Column,
                  specQ: Column) =
      base.withColumn("_x", explode(col("_pm"))).select(Seq(
        subjectId.as(Biolink.Subject),
        lit("biolink:affects").as(Biolink.Predicate),
        col("tgt_term_id").as(Biolink.Object_),
        lit("biolink:causes").as("qualified_predicate"),
        col("_x._phenos").as("object_aspect_qualifier"),
        col("_x._modes").as("causal_mechanism_qualifier"),
        ctxGene.as("subject_context_qualifier"),
        anatTerm.as("anatomical_context_qualifier"),
        emptyToNull(specQ).as("subject_specialization_qualifier"),
        emptyToNull(col("tgt_spec_q")).as("object_specialization_qualifier"),
        emptyToNull(col("_disease_ctx")).as("disease_context_qualifier"),
        emptyToNull(col("tgt_form_q")).as("object_form_or_variant_qualifier")) ++ common: _*)
    val e2 = phenoEdge(col("src_gene_id"), col("tgt_gene_id"), col("src_term_id"),
      col("src_spec_q"))
    val e3 = phenoEdge(col("tgt_gene_id"), col("src_gene_id"), col("tgt_term_id"),
      col("tgt_spec_q"))

    // effector rows: zip effector×function, keep only mapped effectors
    val effBase = base
      .filter(col("_funcs").isNotNull)
      .withColumn("_ef", explode(arrays_zip(col("_effs"), col("_funcs"))))
      .join(genes.withColumnRenamed("gene_id", "eff_gene_id"),
        col("_ef._effs") === col("gene_label")).drop("gene_label")
      .localCheckpoint()

    // edges 4+5: both genes affect the effector gene
    def effectorEdge(subjectId: Column, ctxGene: Column, anatTerm: Column,
                     specQ: Column) =
      effBase.select(Seq(
        subjectId.as(Biolink.Subject),
        lit("biolink:affects").as(Biolink.Predicate),
        col("eff_gene_id").as(Biolink.Object_),
        lit("biolink:causes").as("qualified_predicate"),
        col("_ef._funcs").as("object_aspect_qualifier"),
        lit(null).cast("string").as("causal_mechanism_qualifier"),
        ctxGene.as("subject_context_qualifier"),
        anatTerm.as("anatomical_context_qualifier"),
        emptyToNull(specQ).as("subject_specialization_qualifier"),
        lit(null).cast("string").as("object_specialization_qualifier"),
        lit(null).cast("string").as("disease_context_qualifier"),
        lit(null).cast("string").as("object_form_or_variant_qualifier")) ++ common: _*)
    val e4 = effectorEdge(col("src_gene_id"), col("tgt_gene_id"), col("src_term_id"),
      col("src_spec_q"))
    val e5 = effectorEdge(col("tgt_gene_id"), col("src_gene_id"), col("tgt_term_id"),
      col("tgt_spec_q"))

    // edge 6: effector gene affects the target cell term, per phenotype×mode
    val e6 = effBase.withColumn("_x", explode(col("_pm"))).select(Seq(
      col("eff_gene_id").as(Biolink.Subject),
      lit("biolink:affects").as(Biolink.Predicate),
      col("tgt_term_id").as(Biolink.Object_),
      lit("biolink:causes").as("qualified_predicate"),
      col("_x._phenos").as("object_aspect_qualifier"),
      col("_x._modes").as("causal_mechanism_qualifier"),
      lit(null).cast("string").as("subject_context_qualifier"),
      lit(null).cast("string").as("anatomical_context_qualifier"),
      lit(null).cast("string").as("subject_specialization_qualifier"),
      emptyToNull(col("tgt_spec_q")).as("object_specialization_qualifier"),
      emptyToNull(col("_disease_ctx")).as("disease_context_qualifier"),
      emptyToNull(col("tgt_form_q")).as("object_form_or_variant_qualifier")) ++ common: _*)

    val edges = Seq(e1, e2, e3, e4, e5, e6).reduce(_ unionByName _)
    val nodeIds = Seq(
      base.select(col("src_gene_id").as("id")),
      base.select(col("tgt_gene_id").as("id")),
      base.select(col("src_term_id").as("id")),
      base.select(col("tgt_term_id").as("id")),
      effBase.select(col("eff_gene_id").as("id"))).reduce(_ unionByName _)
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodeIds, edges)
  }
}
