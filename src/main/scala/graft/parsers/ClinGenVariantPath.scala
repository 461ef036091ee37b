package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** ClinGen variant-pathogenicity parser (erepo classification dump).
  *
  * Reference (parsers/ClinGenVariantPathogenicity/src/
  * loadClinGenVariantPathogenicity.py:21-152):
  *  - header-ed TSV; retracted rows (Retracted != "false") drop entirely
  *    (exclude_unconnected_nodes — endpoints don't become nodes either);
  *  - subject `CAID:<Allele Registry Id>` typed biolink:SequenceVariant
  *    with VARIATION + HGNC_GENE_SYMBOL props; object the Mondo id;
  *    predicate "causes" (normalized downstream);
  *  - publications: ','-split PubMed Articles → PMID curies;
  *  - mode-of-inheritance → HPO term(s) via the fixed lookup (the mosaic
  *    entry maps to two terms; the reference emits a bare string for the
  *    single-term cases — here the property is uniformly array<string>);
  *  - assertion → DIRECTION/negated: (Likely) Benign → Contradicts/true,
  *    (Likely) Pathogenic → Supports/false, Uncertain Significance →
  *    Inconclusive/true, anything else → Inconclusive/true + STATUS
  *    "Not evaluated".
  */
object ClinGenVariantPath {

  val provenance = "infores:clingen"

  /** MOI phrase → HPO terms (loadClinGenVariantPathogenicity.py:114-128). */
  val moiLookup: Map[String, Seq[String]] = Map(
    "Autosomal dominant inheritance" -> Seq("HP:0000006"),
    "Autosomal dominant inheritance (with paternal imprinting (HP:0012274))" -> Seq("HP:0012274"),
    "Autosomal dominant inheritance (mosaic)" -> Seq("HP:0000006", "HP:0001442"),
    "Autosomal recessive inheritance" -> Seq("HP:0000007"),
    "Autosomal recessive inheritance (with genetic anticipation)" -> Seq("HP:0000007"),
    "X-linked inheritance" -> Seq("HP:0001417"),
    "X-linked inheritance (dominant (HP:0001423))" -> Seq("HP:0001423"),
    "X-linked inheritance (recessive (HP:0001419))" -> Seq("HP:0001419"),
    "Semidominant inheritance" -> Seq("HP:0032113"),
    "Mitochondrial inheritance" -> Seq("HP:0001427"),
    "Mitochondrial inheritance (primarily or exclusively heteroplasmic)" -> Seq("HP:0001427"))

  private def moiHpo(moi: Column): Column =
    moiLookup.foldLeft(array().cast("array<string>")) { case (acc, (k, v)) =>
      when(moi === k, array(v.map(lit): _*)).otherwise(acc)
    }

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)
    val kept = raw.filter(coalesce(col("Retracted"), lit("")) === "false")

    val assertion = coalesce(col("Assertion"), lit(""))
    val pubs = transform(
      split(coalesce(col("PubMed Articles"), lit("")), ","),
      p => concat(lit("PMID:"), trim(p)))

    val edges = kept.select(
      concat(lit("CAID:"), col("Allele Registry Id")).as(Biolink.Subject),
      lit("causes").as(Biolink.Predicate),
      col("Mondo Id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col("Assertion").as("ASSERTION"),
      col("Applied Evidence Codes (Met)").as("APPLIED_EVIDENCE_CODES_MET"),
      col("Applied Evidence Codes (Not Met)").as("APPLIED_EVIDENCE_CODES_NOT_MET"),
      col("Summary of interpretation").as("SUMMARY"),
      pubs.as(Biolink.Publications),
      col("Expert Panel").as("EXPERT_PANEL"),
      col("Evidence Repo Link").as("EVIDENCE_REPO_LINK"),
      col("Guideline").as("GUIDELINE"),
      col("Approval Date").as("APPROVAL_DATA"),
      col("Published Date").as("PUBLISHED_DATE"),
      col("Mode of Inheritance").as("MODE_OF_INHERITANCE"),
      moiHpo(col("Mode of Inheritance")).as("HPO_FOR_MODE_OF_INHERITANCE"),
      when(assertion.isin("Benign", "Likely Benign"), lit("Contradicts"))
        .when(assertion.isin("Likely Pathogenic", "Pathogenic"), lit("Supports"))
        .otherwise(lit("Inconclusive")).as("DIRECTION"),
      (!assertion.isin("Likely Pathogenic", "Pathogenic")).as(Biolink.Negated),
      when(!assertion.isin("Benign", "Likely Benign", "Likely Pathogenic",
        "Pathogenic", "Uncertain Significance"), lit("Not evaluated")).as("STATUS"))

    val variantNodes = kept.select(
      concat(lit("CAID:"), col("Allele Registry Id")).as("id"),
      lit(null).cast("string").as("name"),
      array(lit("biolink:SequenceVariant")).as("category"),
      col("#Variation").as("VARIATION"),
      col("HGNC Gene Symbol").as("HGNC_GENE_SYMBOL"))
    val diseaseNodes = kept.select(
      col("Mondo Id").as("id"), lit(null).cast("string").as("name"),
      array(lit(Biolink.NamedThing)).as("category"),
      lit(null).cast("string").as("VARIATION"),
      lit(null).cast("string").as("HGNC_GENE_SYMBOL"))
    ExtractedGraph(variantNodes.unionByName(diseaseNodes).dropDuplicates("id"), edges)
  }
}
