package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** Yeast KP parsers (histone-modification map, Costanza 2016 genetic
  * interactions, Gasch diamide gene expression, GSE61888 nucleosomes).
  *
  * The diamide stressor used across the GEO datasets is fixed as
  * PUBCHEM.COMPOUND:5353800 (loadYeastGeneExpressionGasch.py:120,
  * loadYeastNucleosomesGSE61888.py:320).
  */
object Yeast {

  val diamide = "PUBCHEM.COMPOUND:5353800"

  private def bareNodes(edges: DataFrame, idCols: Seq[Column]): DataFrame =
    idCols.map(c => edges.select(c.as("id")))
      .reduce(_ unionByName _)
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))

  /** Histone-modification map (parsers/yeast/src/loadHistoneMap.py:44-166):
    * the loci CSV yields BinHisPTM nodes (name "MOD (chr:start-end)",
    * NucleosomeModification/PosttranslationalModification categories) plus
    * a subclass_of edge to the general "HisPTM:MOD" term; the mod→gene CSV
    * yields located_in edges; the PTM→GO CSV carries its own predicate
    * column (CTD abundance predicates). The loci windows + gene overlap
    * mapping themselves are fetch-time prep in the reference
    * (fetch_histone_data), not parse semantics. */
  def parseHistoneMap(spark: SparkSession, lociCsv: String, mod2GeneCsv: String,
                      ptm2GoCsv: String): ExtractedGraph = {
    val provenance = "infores:yeasthistones"
    val loci = spark.read.option("header", "true").csv(lociCsv).toDF(
      "id", "chromosome", "start_location", "end_location", "loci", "modification")
    val mod2gene = spark.read.option("header", "true").csv(mod2GeneCsv)
    val ptm2go = spark.read.option("header", "true").csv(ptm2GoCsv).toDF(
      "id", "predicate", "go_id", "go_name")

    val subclassEdges = loci.select(
      col("id").as(Biolink.Subject),
      lit("biolink:subclass_of").as(Biolink.Predicate),
      concat(lit("HisPTM:"), col("modification")).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource))
    val geneEdges = mod2gene.select(
      col(mod2gene.columns(0)).as(Biolink.Subject),
      lit("biolink:located_in").as(Biolink.Predicate),
      col(mod2gene.columns(6)).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource))
    val goEdges = ptm2go.select(
      col("id").as(Biolink.Subject),
      col("predicate").as(Biolink.Predicate),
      col("go_id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource))
    val edges = subclassEdges.unionByName(geneEdges).unionByName(goEdges)

    val lociNodes = loci.select(
      col("id"),
      concat(col("modification"), lit(" ("), col("chromosome"), lit(":"),
        col("start_location"), lit("-"), col("end_location"), lit(")")).as("name"),
      array(lit("biolink:NucleosomeModification"),
        lit("biolink:PosttranslationalModification")).as("category"),
      col("modification").as("histoneModification"),
      col("loci").as("chromosomeLocation"))
    val otherNodes = bareNodes(edges, Seq(col(Biolink.Subject), col(Biolink.Object_)))
      .join(lociNodes.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("name"), col("category"),
        lit(null).cast("string").as("histoneModification"),
        lit(null).cast("string").as("chromosomeLocation"))
    ExtractedGraph(lociNodes.unionByName(otherNodes), edges)
  }

  /** Costanza 2016 yeast genetic interactions
    * (parsers/yeast/src/loadCostanza2016.py:13-182): each row is a
    * double-mutant genotype SGD:GENE1-GENE2 linked to fitness (APO:0000216)
    * by the SGA sign predicate (Negative/Positive Genetic → negatively/
    * positively_correlated_with, anything else dropped), plus has_part
    * edges to both member genes. */
  def parseCostanza(spark: SparkSession, path: String): ExtractedGraph = {
    val provenance = "CostanzaGeneticInteractions"
    val raw = spark.read.option("header", "true").option("quote", "\"").csv(path)
    val c = raw.columns
    val gene1 = col(c(0))
    val gene2 = col(c(21))
    val pmid = col(c(8))
    val method = col(c(14))
    val pvalue = col(c(17))
    val sga = col(c(18))
    val allele1 = col(c(19))
    val allele2 = col(c(20))
    val genotypeId = concat(lit("SGD:"), gene1, lit("-"), gene2)
    val pubs = array(concat(lit("PMID:"), pmid))

    val fitnessEdges = raw
      .filter(method.isin("Negative Genetic", "Positive Genetic"))
      .select(
        genotypeId.as(Biolink.Subject),
        when(method === "Negative Genetic", "biolink:negatively_correlated_with")
          .otherwise("biolink:positively_correlated_with").as(Biolink.Predicate),
        lit("APO:0000216").as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        pvalue.as("p-value"), sga.as("sgaScore"), pubs.as(Biolink.Publications),
        lit(null).cast("string").as("gene1_allele"),
        lit(null).cast("string").as("gene2_allele"))
    def hasPart(gene: Column, alleleCol: Column, alleleName: String) = raw.select(
      genotypeId.as(Biolink.Subject),
      lit("biolink:has_part").as(Biolink.Predicate),
      concat(lit("SGD:"), gene).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(null).cast("string").as("p-value"), lit(null).cast("string").as("sgaScore"),
      pubs.as(Biolink.Publications),
      (if (alleleName == "gene1_allele") alleleCol else lit(null).cast("string")).as("gene1_allele"),
      (if (alleleName == "gene2_allele") alleleCol else lit(null).cast("string")).as("gene2_allele"))
    val edges = fitnessEdges
      .unionByName(hasPart(gene1, allele1, "gene1_allele"))
      .unionByName(hasPart(gene2, allele2, "gene2_allele"))

    val genotypeNodes = raw.select(
      genotypeId.as("id"),
      concat(allele1, lit("-"), allele2).as("name"),
      array(lit("biolink:Genotype")).as("category"),
      allele1.as("gene1_allele"), allele2.as("gene2_allele")).dropDuplicates("id")
    val otherNodes = raw.select(concat(lit("SGD:"), gene1).as("id"))
      .unionByName(raw.select(concat(lit("SGD:"), gene2).as("id")))
      .unionByName(spark.range(1).select(lit("APO:0000216").as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"),
        lit(null).cast("string").as("gene1_allele"),
        lit(null).cast("string").as("gene2_allele"))
    ExtractedGraph(genotypeNodes.unionByName(otherNodes), edges)
  }

  /** Gasch diamide gene-expression time series
    * (parsers/yeast/src/loadYeastGeneExpressionGasch.py:51-139): the raw
    * GEO matrix holds 8 log2FC timepoints (cols 3-10); the reference
    * computes the row mean and inner-joins SGDAllGenes on the systematic
    * name at fetch time (pandas merge) — here the same prep is a broadcast
    * join. Diamide →increases/decreases_expression_of→ SGD gene by the
    * sign of the mean. */
  def parseGasch(spark: SparkSession, gaschCsv: String, sgdGenesCsv: String): ExtractedGraph = {
    val raw = spark.read.option("header", "true").csv(gaschCsv)
    val c = raw.columns
    val minuteCols = (3 to 10).map(i => col(c(i)).cast("double"))
    val genes = broadcast(spark.read.option("header", "true").csv(sgdGenesCsv)
      .select(col("primaryIdentifier"), col("secondaryIdentifier")))
    val rows = raw
      .withColumn("mean_expression", minuteCols.reduce(_ + _) / lit(8.0))
      .withColumn("time_series", array(minuteCols: _*))
      .join(genes, col(c(0)) === col("secondaryIdentifier"))

    val edges = rows.select(
      lit(diamide).as(Biolink.Subject),
      when(col("mean_expression") > 0, "biolink:increases_expression_of")
        .otherwise("biolink:decreases_expression_of").as(Biolink.Predicate),
      col("primaryIdentifier").as(Biolink.Object_),
      lit("GaschGeneExpression").as(Biolink.PrimaryKnowledgeSource),
      lit("Gasch, 2010").as("dataset"),
      lit("Genomic expression programs in the response of yeast cells to " +
        "environmental changes (Diamide exposure). Measurements taken at 5, 10, " +
        "20, 30, 40, 50, 60, and 90 minutes with values reported as log2FC.")
        .as("dataComment"),
      col("mean_expression").as("MeanExpression"),
      col("time_series").as("ExpressionTimeSeries"))
    ExtractedGraph(bareNodes(edges, Seq(col(Biolink.Subject), col(Biolink.Object_))), edges)
  }

  /** Modifications measured in the GSE61888 ChIP-seq blocks, in file-column
    * order: block i covers columns 12+6i .. 17+6i
    * (loadYeastNucleosomesGSE61888.py:14-167). */
  val gse61888Mods: Seq[String] = Seq(
    "H2AK5ac", "H2AS129ph", "H3K14ac", "H3K18ac", "H3K23ac", "H3K27ac",
    "H3K36me", "H3K36me2", "H3K36me3", "H3K4ac", "H3K4me", "H3K4me2",
    "H3K4me3", "H3K56ac", "H3K79me", "H3K79me3", "H3K9ac", "H3S10ph",
    "H4K12ac", "H4K16ac", "H4K20me", "H4K5ac", "H4K8ac", "H4R3me",
    "H4R3me2s", "HTZ1")

  /** GSE61888 nucleosome dynamics
    * (parsers/yeast/src/loadYeastNucleosomesGSE61888.py:306-364): diamide
    * →affects_molecular_modification_of→ binned-histone-PTM node; the edge
    * carries coverage (rpm) and the 6-timepoint log2FC series of the row's
    * own modification, surfaced as "<mod>TimeSeries" (one such column
    * non-null per row, mirroring the reference's dynamic property name). */
  def parseGse61888(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = spark.read.option("header", "true").csv(path)
    val c = raw.columns
    require(c.length >= 168, s"GSE61888 matrix: expected ≥168 columns, found ${c.length}")
    val hisMod = col(c(4))

    val seriesCols = gse61888Mods.zipWithIndex.map { case (mod, i) =>
      val base = 12 + 6 * i
      when(hisMod === mod, array((base until base + 6).map(j => col(c(j)).cast("double")): _*))
        .as(s"${mod}TimeSeries")
    }
    val edges = raw.select(Seq(
      lit(diamide).as(Biolink.Subject),
      lit("biolink:affects_molecular_modification_of").as(Biolink.Predicate),
      col(c(0)).as(Biolink.Object_),
      lit("WeinerEpigenomics").as(Biolink.PrimaryKnowledgeSource),
      lit("GSE61888").as("dataset"),
      lit("Occupancy represented as coverage measured in reads per million (rpm). " +
        "Histone modifications measured as log2FC over unmodified state and " +
        "measured at 0,4,8,15,30 and 60 minutes after diamide exposure.")
        .as("dataComment"),
      col(c(8)).cast("double").as("coverage")) ++ seriesCols: _*)
    ExtractedGraph(bareNodes(edges, Seq(col(Biolink.Subject), col(Biolink.Object_))), edges)
  }
}
