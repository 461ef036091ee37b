package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** CEBS (Chemical Effects in Biological Systems) TR/LOE parser.
  *
  * Reference (parsers/CEBS/src/loadCEBS.py:16-138) reads the TR_LOE xlsx
  * sheet; here the sheet is consumed as its CSV export (the spreadsheet
  * codec is a fetch-time concern — same seam as CCIDB), with the
  * embedded-newline header cell flattened to one line.
  *  - subject: INCHIKEY curie; predicate by study evidence level (Clear →
  *    associated_with_increased_likelihood_of, Some →
  *    associated_with_likelihood_of, anything else dropped);
  *  - object: the ';'-split morphology list — first entry that contains
  *    "MONDO:" (taken raw) or whose OBO-PURL compression yields an NCIT
  *    or any non-MPATH curie; otherwise the last entry's compression
  *    (loadCEBS.py:92-108);
  *  - edge carries TR publication, KL by evidence level, and
  *    anatomical (first tissue) / sex / species / strain qualifiers. */
object Cebs {

  val provenance = "infores:cebs"

  /** OBO PURL → curie (the subset of the reference's curies-library
    * converter the CEBS IRIs actually use). */
  private def compress(iri: Column): Column = {
    val m = regexp_extract(iri, "obolibrary\\.org/obo/([A-Za-z]+)_([A-Za-z0-9]+)", 0)
    when(m =!= "", concat(
      regexp_extract(iri, "obolibrary\\.org/obo/([A-Za-z]+)_([A-Za-z0-9]+)", 1),
      lit(":"),
      regexp_extract(iri, "obolibrary\\.org/obo/([A-Za-z]+)_([A-Za-z0-9]+)", 2)))
  }

  /** CSV-export entry (the spreadsheet codec handled at fetch time). */
  def parse(spark: SparkSession, csvPath: String): ExtractedGraph =
    parseFrame(spark,
      spark.read.option("header", "true").option("multiLine", "true").csv(csvPath))

  /** Native xlsx entry: reads the 'Data' sheet exactly as the
    * reference's pd.read_excel (loadCEBS.py:136) through the pure-JDK
    * [[graft.sources.Xlsx]] reader. */
  def parseXlsx(spark: SparkSession, xlsxPath: String): ExtractedGraph =
    parseFrame(spark, graft.sources.Xlsx.readSheet(spark, xlsxPath, "Data"))

  private def parseFrame(spark: SparkSession, raw: org.apache.spark.sql.DataFrame): ExtractedGraph = {
    val evidence = col("Study Level Evidence (Level of Evidence)")

    val morphs = transform(
      split(coalesce(col("Morphology Ontology Link (or ID)"), lit("")), ";"), m => trim(m))
    // first element that passes any of the reference's per-element checks;
    // guarded (null, not ANSI throw) for rows where nothing passes —
    // element_at(arr, 1) on the empty filter result crashes whenever the
    // optimizer evaluates it before/with the evidence row-filter
    val passing = filter(morphs, m =>
      m.contains("MONDO:") ||
        (compress(m).isNotNull &&
          (compress(m).contains("NCIT") || !compress(m).contains("MPATH"))))
    val picked = when(size(passing) >= 1, element_at(passing, 1))
    val objectId = coalesce(
      when(picked.contains("MONDO:"), picked).otherwise(compress(picked)),
      compress(element_at(morphs, -1))) // the loop's trailing possible_id

    val rows = raw
      .filter(evidence.isin("Clear Evidence", "Some Evidence"))
      .withColumn("_object", objectId)
      .filter(col("_object").isNotNull)

    val edges = rows.select(
      concat(lit("INCHIKEY:"), col("InChIKey")).as(Biolink.Subject),
      when(evidence === "Clear Evidence", "biolink:associated_with_increased_likelihood_of")
        .otherwise("biolink:associated_with_likelihood_of").as(Biolink.Predicate),
      col("_object").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      when(evidence === "Clear Evidence", lit(Biolink.KnowledgeAssertion))
        .otherwise(lit("observation")).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType),
      array(concat(lit("TR:"),
        regexp_replace(col("Publication Number"), " ", ""))).as(Biolink.Publications),
      compress(trim(element_at(
        split(col("Tissue (and Locator) Ontology IRI"), ";"), 1)))
        .as("anatomical_context_qualifier"),
      lower(col("Sex")).as("sex_qualifier"),
      compress(col("Species IRI")).as("species_context_qualifier"),
      col("Strain External ID").as("population_context_qualifier"))

    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
