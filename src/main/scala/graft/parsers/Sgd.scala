package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** SGD (Saccharomyces Genome Database) parser — six CSV extractions
  * (parsers/SGD/src/loadSGD.py:10-230):
  *
  *  - the gene list is a nodes-only extraction (rich props; '?' names
  *    fall back to the secondary id);
  *  - gene→GO-term edges with the GO qualifier as predicate
  *    ('involved in' → actively_involved_in, 'is active in' → active_in,
  *    others verbatim) and '?'-guarded PMIDs;
  *  - gene→pathway (participates_in, Pathway object nodes);
  *  - gene→phenotype (genetic_association, phenotype ids
  *    whitespace→'_', experiment/mutant/allele props);
  *  - gene→complex (in_complex_with, CPX: ids, role/stoichiometry);
  *  - complex→GO-term with the file's own predicate column.
  */
object Sgd {

  val provenance = "infores:sgd"
  val yeastTaxon = "NCBITaxon:559292"
  val complexBaseUrl = "https://www.yeastgenome.org/complex/"

  def goQualifierPredicate(q: Column): Column =
    when(q === "involved in", "biolink:actively_involved_in")
      .when(q === "is active in", "biolink:active_in")
      .otherwise(q)

  private def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  private def pubs(c: Column): Column =
    when(c =!= "?", array(concat(lit("PMID:"), c))).otherwise(array().cast("array<string>"))

  def parse(spark: SparkSession, dir: String): ExtractedGraph = {
    val genes = csv(spark, s"$dir/SGDAllGenes.csv")
    val gc = genes.columns
    val geneNodes = genes.select(
      regexp_replace(trim(col(gc(0))), " ", "_").as("id"),
      when(col(gc(2)) =!= "?", col(gc(2))).otherwise(col(gc(1))).as("name"),
      array(lit("biolink:Gene")).as("category"),
      col(gc(1)).as("secondaryID"), col(gc(3)).as("namesake"),
      col(gc(4)).as("protein"), col(gc(5)).as("description"),
      col(gc(10)).as("organism"), col(gc(11)).as("featureType"),
      concat(col(gc(6)), lit(":"), col(gc(7)), lit("-"), col(gc(8)),
        lit(", strand: "), col(gc(9))).as("chromosomeLocation"),
      col(gc(12)).as("referenceLink"))

    val go = csv(spark, s"$dir/SGDGene2GOTerm.csv")
    val goc = go.columns
    val goEdges = go.select(
      col(goc(0)).as(Biolink.Subject),
      goQualifierPredicate(col(goc(9))).as(Biolink.Predicate),
      col(goc(5)).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col(goc(8)).as("evidenceCode"), col(goc(10)).as("evidenceCodeText"),
      col(goc(12)).as("annotationType"),
      pubs(col(goc(15))).as(Biolink.Publications))
    val goNodes = go.select(col(goc(5)).as("id"), col(goc(6)).as("name"),
      array(lit(Biolink.NamedThing)).as("category"))

    val pw = csv(spark, s"$dir/SGDGene2Pathway.csv")
    val pwc = pw.columns
    val pwEdges = pw.select(
      col(pwc(0)).as(Biolink.Subject),
      lit("biolink:participates_in").as(Biolink.Predicate),
      col(pwc(2)).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource))
    val pwNodes = pw.select(col(pwc(2)).as("id"), col(pwc(3)).as("name"),
      array(lit("biolink:Pathway")).as("category"),
      col(pwc(1)).as("organism"), col(pwc(4)).as("referenceLink"))

    val ph = csv(spark, s"$dir/SGDGene2Phenotype.csv")
    val phc = ph.columns
    val phEdges = ph.select(
      col(phc(0)).as(Biolink.Subject),
      lit("biolink:genetic_association").as(Biolink.Predicate),
      regexp_replace(col(phc(18)), " ", "_").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col(phc(8)).as("effectOnPhenotype"), col(phc(14)).as("phenotypeDetails"),
      col(phc(5)).as("experimentType"), col(phc(6)).as("mutantType"),
      col(phc(9)).as("geneAllele"), col(phc(11)).as("yeastStrainBackground"),
      col(phc(12)).as("chemicalExposure"), col(phc(13)).as("experimentalCondition"),
      pubs(col(phc(15))).as(Biolink.Publications))
    val phNodes = ph.select(regexp_replace(col(phc(18)), " ", "_").as("id"),
      col(phc(7)).as("name"), array(lit("biolink:PhenotypicFeature")).as("category"),
      lit(yeastTaxon).as("taxon"), col(phc(19)).as("referenceLink"))

    val cx = csv(spark, s"$dir/SGDGene2Complex.csv")
    val cxc = cx.columns
    val cxEdges = cx.select(
      col(cxc(11)).as(Biolink.Subject),
      lit("biolink:in_complex_with").as(Biolink.Predicate),
      concat(lit("CPX:"), col(cxc(10))).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col(cxc(5)).as("geneBiologicalRole"), col(cxc(6)).as("geneStoichiometry"),
      col(cxc(7)).as("interactorType"))
    val cxNodes = cx.select(concat(lit("CPX:"), col(cxc(10))).as("id"),
      col(cxc(0)).as("name"), array(lit("biolink:MacromolecularComplexMixin")).as("category"),
      col(cxc(1)).as("function"), col(cxc(2)).as("systematicName"),
      col(cxc(10)).as("SGDAccessionID"), lit(yeastTaxon).as("taxon"),
      concat(lit(complexBaseUrl), col(cxc(10))).as("referenceLink"))

    val cg = csv(spark, s"$dir/SGDComplex2GOTerm.csv")
    val cgc = cg.columns
    val cgEdges = cg.select(
      concat(lit("CPX:"), col(cgc(0))).as(Biolink.Subject),
      col(cgc(3)).as(Biolink.Predicate),
      col(cgc(1)).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource))

    val edges = Seq(goEdges, pwEdges, phEdges, cxEdges, cgEdges)
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val nodes = Seq(geneNodes, goNodes, pwNodes, phNodes, cxNodes)
      .reduce(_.unionByName(_, allowMissingColumns = true))
      .dropDuplicates("id")
    ExtractedGraph(nodes, edges)
  }
}
