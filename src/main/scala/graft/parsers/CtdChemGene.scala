package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.CtdRules
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** CTD expanded chemical↔gene interaction parser.
  *
  * Reference semantics (parsers/CTD/src/loadCTD.py:142-235,474-545):
  *  - the source is a tar.gz member, headerless 9-column TSV:
  *    chemicalID, chem_label, interaction, direction, geneID, gene_label,
  *    form, taxonID, PMID;
  *  - any field containing '?' marks the row unusable;
  *  - publication-count evidence gates: expression/methylation/molecular-
  *    modification interactions need ≥3 PMIDs, splicing needs ≥2;
  *  - ids upper-cased; `direction` ('->' / '<-') picks subject vs object;
  *  - predicate = CTD:<interaction> cleaned ('/',' ','^' → '_') then mapped
  *    through the predicate conversion map;
  *  - edge props: description = interaction, taxon = NCBITaxon curie,
  *    publications (upper-cased PMIDs), knowledge_assertion/manual_agent.
  */
object CtdChemGene {

  val provenance = "infores:ctd"

  val columns: Seq[String] = Seq(
    "chemicalID", "chem_label", "interaction", "direction", "geneID",
    "gene_label", "form", "taxonID", "PMID")

  private val needs3Pubs = Seq(
    "affects expression of", "increases expression of", "decreases expression of",
    "affects methylation of", "increases methylation of", "decreases methylation of",
    "affects molecular modification of", "increases molecular modification of",
    "decreases molecular modification of")

  private val needs2Pubs = Seq(
    "affects splicing of", "increases splicing of", "decreases splicing of")

  /** Row usability gate (check_expanded_gene_chemical_row, loadCTD.py:474-526). */
  def goodRow(df: DataFrame): Column = {
    val anyQuestionMark = columns
      .map(c => coalesce(col(c), lit("")).contains("?"))
      .reduce(_ || _)
    val nPubs = size(split(col("PMID"), "\\|"))
    !anyQuestionMark &&
      !(nPubs < 3 && col("interaction").isin(needs3Pubs: _*)) &&
      !(nPubs < 2 && col("interaction").isin(needs2Pubs: _*))
  }

  def readMember(spark: SparkSession, archivePath: String, member: String): DataFrame = {
    val df = Archives.readDelimitedMember(spark, archivePath, member, header = false)
    val named = columns.zipWithIndex.foldLeft(df) {
      case (d, (c, i)) => d.withColumnRenamed(s"_c$i", c)
    }
    // the reference skips the in-archive header row with next(fp)
    named.filter(col("chemicalID") =!= "chemicalID")
  }

  def parse(spark: SparkSession, archivePath: String,
            member: String = "CTD_chem_gene_ixns_structured.tsv"): ExtractedGraph =
    parseRows(readMember(spark, archivePath, member))

  /** Parse already-read rows (direct entry point for fixtures/tests). */
  def parseRows(raw: DataFrame): ExtractedGraph = {
    val base = raw.filter(goodRow(raw))
      .withColumn("chemical_id", upper(col("chemicalID")))
      .withColumn("gene_id", upper(col("geneID")))
      .withColumn("_fwd", col("direction") === "->")

    val edges = base.select(
      when(col("_fwd"), col("chemical_id")).otherwise(col("gene_id")).as(Biolink.Subject),
      CtdRules.cleanPredicate(concat(lit("CTD:"), col("interaction"))).as(Biolink.Predicate),
      when(col("_fwd"), col("gene_id")).otherwise(col("chemical_id")).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col("interaction").as("description"),
      concat(lit("NCBITaxon:"), element_at(split(col("taxonID"), ":"), -1)).as("taxon"),
      transform(split(col("PMID"), "\\|"), p => upper(p)).as(Biolink.Publications),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val chems = base.select(col("chemical_id").as("id"), col("chem_label").as("name"))
    val genes = base.select(col("gene_id").as("id"), col("gene_label").as("name"))
    val nodes = chems.unionByName(genes).dropDuplicates("id")
      .select(col("id"), col("name"), array(lit(Biolink.NamedThing)).as("category"))

    ExtractedGraph(nodes, edges)
  }
}
