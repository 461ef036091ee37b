package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** CORD-19 literature-cooccurrence parser.
  *
  * Reference (parsers/cord19/src/loadCord19.py:9-200): four extractions —
  * scibite and scigraph cooccurrence pairs (correlated_with, enrichment
  * p + effective publication counts; scibite ids carry '_' to strip),
  * curated COVID phenotypes (MONDO:0100096 has-phenotype HP terms with
  * notes), and DrugBank trials (ROBOKOVID:<predicate> drug→target with
  * counts) — followed by the COVID mirror pass: every edge touching the
  * COVID disease (MONDO:0100096) gains a copy against the SARS-CoV-2
  * taxon (NCBITaxon:2697049) and vice versa, self-loops skipped.
  */
object Cord19 {

  val provenance = "infores:cord19"
  val covidDiseaseId = "MONDO:0100096"
  val coronavirusTaxonId = "NCBITaxon:2697049"

  private def edgeShape(df: DataFrame): DataFrame = df.select(
    col(Biolink.Subject), col(Biolink.Predicate), col(Biolink.Object_),
    col(Biolink.PrimaryKnowledgeSource),
    col("num_publications"), col("enrichment_p"), col("notes"), col("count"))

  def parse(spark: SparkSession, dir: String): ExtractedGraph = {
    def tsv(name: String, sep: String = "\t") =
      spark.read.option("sep", sep).option("header", "true").csv(s"$dir/$name")

    def cooccurrence(df: DataFrame, stripUnderscores: Boolean, pks: String,
                     enrichIdx: Int, pubsIdx: Int): DataFrame = {
      val c = df.columns
      def id(i: Int) = if (stripUnderscores) regexp_replace(col(c(i)), "_", "") else col(c(i))
      edgeShape(df.select(
        id(0).as(Biolink.Subject),
        lit("biolink:correlated_with").as(Biolink.Predicate),
        id(1).as(Biolink.Object_),
        lit(pks).as(Biolink.PrimaryKnowledgeSource),
        col(c(pubsIdx)).cast("double").as("num_publications"),
        col(c(enrichIdx)).cast("double").as("enrichment_p"),
        lit(null).cast("string").as("notes"),
        lit(null).cast("string").as("count")))
    }

    val scibite = cooccurrence(tsv("CV19_edges.txt"), stripUnderscores = true,
      pks = "infores:cord19-scibite", enrichIdx = 5, pubsIdx = 6)
    val scigraph = cooccurrence(tsv("pairs.txt"), stripUnderscores = false,
      pks = provenance, enrichIdx = 2, pubsIdx = 3)

    val phen = tsv("covid_phenotypes.csv", sep = ",")
    val pc = phen.columns
    val phenotypes = edgeShape(phen.select(
      lit(covidDiseaseId).as(Biolink.Subject),
      lit("RO:0002200").as(Biolink.Predicate),
      col(pc(1)).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(null).cast("double").as("num_publications"),
      lit(null).cast("double").as("enrichment_p"),
      col(pc(3)).as("notes"),
      lit(null).cast("string").as("count")))

    val tr = tsv("trials.txt")
    val tc = tr.columns
    val trials = edgeShape(tr.select(
      col(tc(0)).as(Biolink.Subject),
      concat(lit("ROBOKOVID:"), col(tc(1))).as(Biolink.Predicate),
      col(tc(2)).as(Biolink.Object_),
      lit("infores:drugbank").as(Biolink.PrimaryKnowledgeSource),
      lit(null).cast("double").as("num_publications"),
      lit(null).cast("double").as("enrichment_p"),
      lit(null).cast("string").as("notes"),
      col(tc(3)).as("count")))

    val base = scibite.unionByName(scigraph).unionByName(phenotypes).unionByName(trials)
      .localCheckpoint() // the mirror pass re-enters

    // COVID disease ↔ coronavirus taxon mirror (loadCord19.py:~170-195):
    // the FIRST matching endpoint rewrites (subject checked before object)
    def swap(c: org.apache.spark.sql.Column) =
      when(c === covidDiseaseId, coronavirusTaxonId)
        .when(c === coronavirusTaxonId, covidDiseaseId)
        .otherwise(c)
    val mirrored = base
      .filter(col(Biolink.Subject).isin(covidDiseaseId, coronavirusTaxonId) ||
        col(Biolink.Object_).isin(covidDiseaseId, coronavirusTaxonId))
      .withColumn(Biolink.Subject,
        when(col(Biolink.Subject).isin(covidDiseaseId, coronavirusTaxonId),
          swap(col(Biolink.Subject))).otherwise(col(Biolink.Subject)))
      .withColumn(Biolink.Object_,
        when(!col(Biolink.Subject).isin(covidDiseaseId, coronavirusTaxonId) &&
          col(Biolink.Object_).isin(covidDiseaseId, coronavirusTaxonId),
          swap(col(Biolink.Object_))).otherwise(col(Biolink.Object_)))
      .filter(col(Biolink.Subject) =!= col(Biolink.Object_))

    val edges = base.unionByName(mirrored)
    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
