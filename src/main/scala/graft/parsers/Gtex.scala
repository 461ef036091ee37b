package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.functions.Hgvs
import graft.model.Biolink
import graft.sources.Archives

/** GTEx eQTL/sQTL parser: variant → gene expression/splicing effects.
  *
  * Reference semantics (parsers/GTEx/src/loadGTEx.py:25-74,134-330,
  * orion/hgvs_utils.py:34-111):
  *  - a tar holds one gzipped TSV per tissue; only members whose name
  *    contains 'signif' parse; the tissue name (file name before the first
  *    '.') maps to an UBERON anatomy curie — unknown tissues are skipped;
  *  - variant ids (`chr1_1413898_T_C_b38`) convert to HGVS curies; rows
  *    whose variant fails conversion are skipped;
  *  - eQTL gene = column 1 minus version → ENSEMBL curie; sQTL gene sits
  *    in position 4 of the ':'-separated phenotype id;
  *  - predicate: sQTL → CTD:affects_splicing_of, else slope sign picks
  *    CTD:increases/decreases_expression_of;
  *  - edge props: expressed_in=[anatomy], p_value=[..], slope=[..],
  *    prediction / computational_model.
  *
  * Spark-first: tissue membership rides on input_file_name() so all staged
  * tissue files scan as ONE DataFrame; the reference's per-variant HGVS
  * memo dict is unnecessary — the conversion is a pure projection.
  */
object Gtex {

  val provenance = "infores:gtex"

  /** Tissue-directory → UBERON anatomy (loadGTEx.py:25-74; full table in
    * the reference — extend as tissues appear in the archive). */
  val tissues: Map[String, String] = Map(
    "Adipose_Subcutaneous" -> "UBERON:0002190",
    "Adipose_Visceral_Omentum" -> "UBERON:0003688",
    "Adrenal_Gland" -> "UBERON:0018303",
    "Artery_Aorta" -> "UBERON:0004178",
    "Artery_Coronary" -> "UBERON:0002111",
    "Artery_Tibial" -> "UBERON:0007610",
    "Brain_Amygdala" -> "UBERON:0001876",
    "Brain_Cerebellum" -> "UBERON:0002037",
    "Brain_Cortex" -> "UBERON:0001851",
    "Brain_Hippocampus" -> "UBERON:0002310",
    "Breast_Mammary_Tissue" -> "UBERON:0001911",
    "Colon_Sigmoid" -> "UBERON:0001159",
    "Colon_Transverse" -> "UBERON:0001157",
    "Heart_Atrial_Appendage" -> "UBERON:0006618",
    "Heart_Left_Ventricle" -> "UBERON:0002084",
    "Kidney_Cortex" -> "UBERON:0001225",
    "Liver" -> "UBERON:0002107",
    "Lung" -> "UBERON:0002048",
    "Muscle_Skeletal" -> "UBERON:0001134",
    "Nerve_Tibial" -> "UBERON:0001323",
    "Pancreas" -> "UBERON:0001264",
    "Pituitary" -> "UBERON:0000007",
    "Skin_Not_Sun_Exposed_Suprapubic" -> "UBERON:0036149",
    "Skin_Sun_Exposed_Lower_leg" -> "UBERON:0004264",
    "Spleen" -> "UBERON:0002106",
    "Stomach" -> "UBERON:0000945",
    "Thyroid" -> "UBERON:0002046",
    "Whole_Blood" -> "UBERON:0000178")

  /** Stage 'signif' members of the tar and scan them as one DataFrame with
    * a `tissue` column from the staged file name. */
  def readTar(spark: SparkSession, tarPath: String): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory("graft-gtex-").toString
    val staged = Archives.extractMembers(tarPath, staging, _.contains("signif"))
    require(staged.nonEmpty, s"no 'signif' members in $tarPath")
    spark.read.option("sep", "\t").option("header", "true").csv(staged: _*)
      .withColumn("tissue",
        element_at(split(element_at(split(input_file_name(), "/"), -1), "\\."), 1))
  }

  private def mapLookup(c: org.apache.spark.sql.Column, m: Map[String, String]) =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  def parse(spark: SparkSession, tarPath: String, isSqtl: Boolean): ExtractedGraph = {
    val base = readTar(spark, tarPath)
      .withColumn("anatomy_id", mapLookup(col("tissue"), tissues))
      .filter(col("anatomy_id").isNotNull) // unknown tissue → skipped
      // try_cast: a malformed position is a failed conversion (skipped),
      // not a job abort under ANSI mode
      .withColumn("_pos", expr("try_cast(split(variant_id, '_')[1] AS BIGINT)"))
      .filter(col("_pos").isNotNull)
      .withColumn("_hgvs", Hgvs.hgvsUdf(
        regexp_extract(col("variant_id"), "^chr([^_]+)_", 1),
        col("_pos"),
        element_at(split(col("variant_id"), "_"), 3),
        element_at(split(col("variant_id"), "_"), 4),
        element_at(split(col("variant_id"), "_"), 5)))
      .filter(col("_hgvs") =!= "") // failed conversion → skipped (loadGTEx.py:205-211)
      .withColumn("variant_curie", concat(lit("HGVS:"), col("_hgvs")))
      .withColumn("gene_curie", concat(lit("ENSEMBL:"),
        element_at(split(
          if (isSqtl) element_at(split(col("phenotype_id"), ":"), 5) else col("gene_id"),
          "\\."), 1)))

    val predicate =
      if (isSqtl) lit("CTD:affects_splicing_of")
      else when(col("slope").cast("double") > 0, "CTD:increases_expression_of")
        .otherwise("CTD:decreases_expression_of")

    val edges = base.select(
      col("variant_curie").as(Biolink.Subject),
      predicate.as(Biolink.Predicate),
      col("gene_curie").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      array(col("anatomy_id")).as("expressed_in"),
      array(col("pval_nominal").cast("double")).as("p_value"),
      array(col("slope").cast("double")).as("slope"),
      lit(Biolink.Prediction).as(Biolink.KnowledgeLevel),
      lit(Biolink.ComputationalModel).as(Biolink.AgentType))

    val variantNodes = base.select(col("variant_curie").as("id"))
      .dropDuplicates("id")
      .select(col("id"), lit("").as("name"),
        array(lit("biolink:SequenceVariant")).as("category"))
    val geneNodes = base.select(col("gene_curie").as("id"))
      .dropDuplicates("id")
      .select(col("id"), lit("").as("name"), array(lit("biolink:Gene")).as("category"))

    ExtractedGraph(variantNodes.unionByName(geneNodes), edges)
  }
}
