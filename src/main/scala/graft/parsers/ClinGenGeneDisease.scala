package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** ClinGen gene-disease validity parser.
  *
  * Reference (parsers/ClinGenGeneDiseaseValidity/src/
  * loadClinGenGeneDiseaseValidity.py:10-157): comma-separated download with
  * 6 metadata lines before the header; gene (col 1) →
  * gene_associated_with_condition → disease (col 3); edge props carry the
  * validity classification/date/report and the normalized mode of
  * inheritance (moi_lookup: code → label + HPO id; unknown codes → null). */
object ClinGenGeneDisease {

  val provenance = "infores:clingen"
  val linesToSkip = 6

  /** moi code → (normalized label, HPO id) (loadClinGen...py:69-99). */
  val moiLookup: Map[String, (String, String)] = Map(
    "AD" -> ("Autosomal Dominant", "0000006"),
    "AR" -> ("Autosomal Recessive", "0000007"),
    "MT" -> ("Mitochondrial", "0001427"),
    "SD" -> ("Semidominant", "0032113"),
    "XL" -> ("X-linked", "0001417"),
    "UD" -> ("Undetermined Mode of Inheritance", null))

  private def moiCol(moi: Column, f: ((String, String)) => String): Column =
    moiLookup.foldLeft(lit(null).cast("string")) { case (acc, (code, v)) =>
      when(moi === code, lit(f(v))).otherwise(acc)
    }

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    // skip the 6 metadata lines before the header (brittle in the
    // reference too, and flagged there); spark csv can't skip N lines, so
    // read as text, drop, re-parse
    import spark.implicits._
    val lines = spark.read.textFile(path).rdd.zipWithIndex()
      .filter(_._2 >= linesToSkip).map(_._1).toDF("value").as[String]
    val raw = spark.read.option("header", "true").csv(lines)
    val cols = raw.columns
    val base = raw.select(
      col(cols(1)).as("gene_id"), col(cols(0)).as("gene_symbol"),
      col(cols(3)).as("disease_id"), col(cols(2)).as("disease_label"),
      col(cols(4)).as("moi"), col(cols(6)).as("classification"),
      col(cols(7)).as("report"), col(cols(8)).as("classification_date"))

    val edges = base.select(
      col("gene_id").as(Biolink.Subject),
      lit("gene_associated_with_condition").as(Biolink.Predicate),
      col("disease_id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col("classification").as("CLINGEN_VALIDITY_CLASSIFICATION"),
      col("classification_date").as("CLINGEN_CLASSIFICATION_DATE"),
      col("report").as("CLINGEN_CLASSIFICATION_REPORT"),
      moiCol(col("moi"), _._1).as("NORMALIZED_MODE_OF_INHERITANCE"),
      moiCol(col("moi"), v => Option(v._2).orNull)
        .as("HPO_FOR_NORMALIZED_MODE_OF_INHERITANCE"))

    val genes = base.select(col("gene_id").as("id"), col("gene_symbol").as("name"),
      array(lit("biolink:Gene")).as("category"))
    val diseases = base.select(col("disease_id").as("id"), col("disease_label").as("name"),
      array(lit("biolink:Disease")).as("category"))
    ExtractedGraph(genes.unionByName(diseases).dropDuplicates("id"), edges)
  }
}
