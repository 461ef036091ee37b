package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** Bgee gene-expression parser.
  *
  * Reference (parsers/Bgee/src/loadBgee.py:32-244): header-addressed gz
  * TSV of expression calls:
  *  - rows with missing required fields, Expression ≠ 'present',
  *    FDR > 1e-4 or expression score < 90 are skipped;
  *  - `CL:x ∩ UBERON:y` intersections split into the cell (object) and
  *    the anatomical-context qualifier, with the entity name blanked;
  *  - gene ids keep existing curies, bare ENS* gets the ENSEMBL prefix;
  *  - edges are biolink:expressed_in with observation / data_pipeline,
  *    adjusted p-value (FDR), call-quality confidence, expression score
  *    and rank, and the original ids;
  *  - CL: objects are Cells, everything else AnatomicalEntity. */
object Bgee {

  val provenance = "infores:bgee"
  val fdrThreshold = 1e-4
  val expressionScoreThreshold = 90.0

  def parse(spark: SparkSession, path: String, taxonId: String,
            fdrMax: Double = fdrThreshold,
            scoreMin: Double = expressionScoreThreshold): ExtractedGraph = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)

    val required = Seq("Gene ID", "Gene name", "Anatomical entity ID",
      "Anatomical entity name", "Expression", "Call quality", "FDR",
      "Expression score", "Expression rank")
    val missing = required.filterNot(raw.columns.contains)
    require(missing.isEmpty, s"Bgee input missing required columns: $missing")

    val base = raw
      .filter(required.map(c => col(c).isNotNull && col(c) =!= "").reduce(_ && _))
      .filter(col("Expression") === "present")
      .withColumn("_fdr", col("FDR").cast("double"))
      .withColumn("_score", col("Expression score").cast("double"))
      .filter(col("_fdr") <= fdrMax && col("_score") >= scoreMin)
      .withColumn("_is_intersection", col("Anatomical entity ID").contains("∩"))
      .withColumn("_object_id",
        when(col("_is_intersection"),
          trim(element_at(split(col("Anatomical entity ID"), "∩"), 1)))
          .otherwise(col("Anatomical entity ID")))
      .withColumn("_context",
        when(col("_is_intersection"),
          trim(element_at(split(col("Anatomical entity ID"), "∩"), 2))))
      .withColumn("_subject_id",
        when(col("Gene ID").contains(":"), col("Gene ID"))
          .otherwise(concat(lit("ENSEMBL:"), col("Gene ID"))))

    val edges = base.select(
      col("_subject_id").as(Biolink.Subject),
      lit("biolink:expressed_in").as(Biolink.Predicate),
      col("_object_id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit("observation").as(Biolink.KnowledgeLevel),
      lit("data_pipeline").as(Biolink.AgentType),
      col("_fdr").as("adjusted_p_value"),
      col("Call quality").as("has_confidence_level"),
      col("_score").as("has_confidence_score"),
      col("Expression rank").cast("double").as("bgee_expression_rank"),
      col("Gene ID").as("original_subject"),
      col("Anatomical entity ID").as("original_object"),
      col("_context").as("anatomical_context_qualifier"))

    val geneNodes = base.select(col("_subject_id").as("id"),
        col("Gene name").as("name"), array(lit("biolink:Gene")).as("category"),
        lit(taxonId).as("taxon"))
      .dropDuplicates("id")
    val anatomyNodes = base.select(col("_object_id").as("id"),
        when(col("_is_intersection"), lit("")).otherwise(col("Anatomical entity name")).as("name"),
        when(col("_object_id").startsWith("CL:"), array(lit("biolink:Cell")))
          .otherwise(array(lit("biolink:AnatomicalEntity"))).as("category"),
        lit(null).cast("string").as("taxon"))
      .dropDuplicates("id")
    ExtractedGraph(geneNodes.unionByName(anatomyNodes), edges)
  }
}
