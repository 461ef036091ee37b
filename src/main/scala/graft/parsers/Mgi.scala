package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** MGI (Mouse Genome Informatics) parsers.
  *
  * Reference (parsers/MGI/src/loadMGI.py:22-330): both loaders join
  * against the MRK_List2 marker report (only Gene-type markers pass):
  *  - gene-phenotype (MGI_GenePheno.rpt, headerless 8 columns): marker
  *    ids ('|' lists) → biolink:has_phenotype → MP terms, with the
  *    allelic composition / background / genotype as list props and
  *    ','-or-'|'-separated pubmed ids as PMID curies;
  *  - gene-disease (MGI_DO.rpt, header-addressed): mouse rows
  *    (taxon 10090) with Entrez + MGI ids where the MGI marker is a
  *    Gene → NCBIGene biolink:model_of DO disease.
  *
  * Spark-first: the reference's driver-side marker dict is a broadcast
  * join on the marker report.
  */
object Mgi {

  val provenance = "infores:mgi"
  val mouseTaxon = "NCBITaxon:10090"

  def markerLookup(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)
      .select(col("MGI Accession ID").as("marker_id"),
        col("Marker Symbol").as("marker_symbol"),
        col("Marker Type").as("marker_type"))

  /** ','/'|'-separated pubmed ids → PMID curies (digits or PMID: kept). */
  private def pubmedCuries(c: Column): Column =
    filter(
      transform(split(regexp_replace(coalesce(c, lit("")), ",", "|"), "\\|"),
        p => {
          val t = trim(p)
          when(t.startsWith("PMID:"), t)
            .when(t.rlike("^\\d+$"), concat(lit("PMID:"), t))
        }),
      _.isNotNull)

  def parseGenePhenotypes(spark: SparkSession, genePhenoPath: String,
                          markerPath: String): ExtractedGraph = {
    val markers = broadcast(markerLookup(spark, markerPath)
      .filter(col("marker_type") === "Gene"))
    val raw = spark.read.option("sep", "\t").option("header", "false").csv(genePhenoPath)
    val c = raw.columns
    require(c.length >= 8, s"MGI_GenePheno.rpt: expected 8 columns, found ${c.length}")

    val rows = raw
      .filter(col(c(4)).isNotNull && col(c(4)) =!= "") // MP id required
      .select(col(c(0)).as("allelic_composition"), col(c(1)).as("allele_symbols"),
        col(c(2)).as("allele_ids"), col(c(3)).as("genetic_background"),
        col(c(4)).as("mp_id"), col(c(5)).as("pubmed_ids"), col(c(7)).as("genotype_id"),
        explode(filter(transform(split(col(c(6)), "\\|"), m => trim(m)), m => m =!= ""))
          .as("marker_id"))
      .join(markers, Seq("marker_id")) // non-gene / unknown markers drop
      .localCheckpoint()

    val edges = rows.select(
      col("marker_id").as(Biolink.Subject),
      lit("biolink:has_phenotype").as(Biolink.Predicate),
      col("mp_id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      array(col("allelic_composition")).as("mgi_allelic_composition"),
      array(col("allele_symbols")).as("mgi_allele_symbols"),
      array(col("allele_ids")).as("mgi_allele_ids"),
      array(col("genetic_background")).as("mgi_genetic_background"),
      array(col("genotype_id")).as("mgi_genotype_id"),
      when(size(pubmedCuries(col("pubmed_ids"))) > 0, pubmedCuries(col("pubmed_ids")))
        .as(Biolink.Publications),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val geneNodes = rows.select(col("marker_id").as("id"),
        col("marker_symbol").as("name"), array(lit("biolink:Gene")).as("category"),
        lit(mouseTaxon).as("taxon")).dropDuplicates("id")
    val mpNodes = rows.select(col("mp_id").as("id"), lit(null).cast("string").as("name"),
        array(lit("biolink:PhenotypicFeature")).as("category"),
        lit(null).cast("string").as("taxon")).dropDuplicates("id")
    ExtractedGraph(geneNodes.unionByName(mpNodes), edges)
  }

  def parseGeneDisease(spark: SparkSession, doPath: String,
                       markerPath: String): ExtractedGraph = {
    val markers = broadcast(markerLookup(spark, markerPath)
      .filter(col("marker_type") === "Gene")
      .select(col("marker_id")))
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(doPath)
    val required = Seq("DO Disease ID", "DO Disease Name", "NCBI Taxon ID",
      "Symbol", "EntrezGene ID", "Mouse MGI ID")
    val missing = required.filterNot(raw.columns.contains)
    require(missing.isEmpty, s"MGI_DO.rpt is missing required columns: $missing")

    val rows = raw
      .filter(col("NCBI Taxon ID") === "10090" &&
        col("Mouse MGI ID").isNotNull && col("Mouse MGI ID") =!= "" &&
        col("EntrezGene ID").isNotNull && col("EntrezGene ID") =!= "" &&
        col("DO Disease ID").isNotNull && col("DO Disease ID") =!= "")
      .join(markers, raw("Mouse MGI ID") === markers("marker_id"))
      .localCheckpoint()

    val edges = rows.select(
      concat(lit("NCBIGene:"), col("EntrezGene ID")).as(Biolink.Subject),
      lit("biolink:model_of").as(Biolink.Predicate),
      col("DO Disease ID").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val geneNodes = rows.select(concat(lit("NCBIGene:"), col("EntrezGene ID")).as("id"),
        col("Symbol").as("name"), array(lit("biolink:Gene")).as("category"),
        lit(mouseTaxon).as("taxon")).dropDuplicates("id")
    val diseaseNodes = rows.select(col("DO Disease ID").as("id"),
        col("DO Disease Name").as("name"), array(lit("biolink:Disease")).as("category"),
        lit(null).cast("string").as("taxon")).dropDuplicates("id")
    ExtractedGraph(geneNodes.unionByName(diseaseNodes), edges)
  }

  /** MP→EMAPA phenotype-anatomy associations (MP_EMAPA.rpt, headerless
    * 4 columns). Reference (parsers/MGI/src/loadMGI.py:374-426): rows with
    * a column count other than 4 or a missing MP/EMAPA id are skipped;
    * MP (PhenotypicFeature) --biolink:affects--> EMAPA (AnatomicalEntity)
    * with the shared KL/AT edge properties. */
  def parsePhenotypeAnatomy(spark: SparkSession, path: String): ExtractedGraph = {
    import spark.implicits._
    val rows = spark.read.textFile(path)
      .map(_.split("\t", -1))
      .filter(r => r.length == 4 && r(0).nonEmpty && r(2).nonEmpty)
      .map(r => (r(0), r(1), r(2), r(3)))
      .toDF("mp_id", "mp_label", "emapa_id", "emapa_label")

    val edges = rows.select(
      col("mp_id").as(Biolink.Subject),
      lit("biolink:affects").as(Biolink.Predicate),
      col("emapa_id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val mpNodes = rows.select(col("mp_id").as("id"), col("mp_label").as("name"),
      array(lit("biolink:PhenotypicFeature")).as("category"))
    val emapaNodes = rows.select(col("emapa_id").as("id"), col("emapa_label").as("name"),
      array(lit("biolink:AnatomicalEntity")).as("category"))
    ExtractedGraph(mpNodes.unionByName(emapaNodes).dropDuplicates("id"), edges)
  }
}
