package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** Guide to Pharmacology (GtoPdb) parser.
  *
  * Reference (parsers/gtopdb/src/loadGtoPdb.py:9-230): three
  * header-addressed TSVs whose leading `"#` comment lines are skipped:
  *  - interactions: Human targets with an Ensembl gene id only;
  *    None/Fusion-protein interaction types dropped, others snakified
  *    through the DGIDB predicate mapping (unmapped rows skipped with an
  *    error, not a crash); '|' gene lists fan out; primaryTarget /
  *    endogenous booleans, affinity (median + units), PMIDs; Human
  *    peptide ligands with gene symbols additionally assert
  *    RO:0002205 (has gene product) gene→ligand via the HGNC map;
  *  - peptides: Human rows with subunit ids fan out BFO:0000051
  *    (has part) ligand→subunit edges;
  *  - names ascii-sanitized (non-ascii characters removed). */
object GtoPdb {

  val provenance = "infores:gtopdb"
  val hasGeneProductPredicate = "RO:0002205"
  val hasPartPredicate = "BFO:0000051"
  val badInteractionTypes = Seq("None", "Fusion protein")

  private def ascii(c: Column): Column = regexp_replace(c, "[^\\x00-\\x7F]", "")

  /** GtoPdb comment lines start with `"#` (a quoted hash) which Spark's
    * single-char comment option can't skip — filter as text, then parse
    * (the reference's `row[0:2] != '\"#'` filter). */
  private def readTsv(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).filter(l => !l.startsWith("\"#"))
    spark.read.option("sep", "\t").option("header", "true").csv(lines)
  }

  private def mapLookup(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  def parse(spark: SparkSession, dir: String): ExtractedGraph = {
    val geneMap = readTsv(spark, s"$dir/GtP_to_HGNC_mapping.tsv")
      .select(upper(col("HGNC Symbol")).as("symbol"), col("HGNC ID").as("hgnc_id"))

    val interactions = readTsv(spark, s"$dir/interactions.tsv")
      .filter(col("Target Species").contains("Human") &&
        col("Target Ensembl Gene ID").isNotNull && col("Target Ensembl Gene ID") =!= "")
      .filter(!col("Type").isin(badInteractionTypes: _*))
      // hoist the snakify so the 45-way predicate map compares one simple
      // column (inlining it per branch explodes whole-stage codegen)
      .withColumn("_snake", DrugCentral.snakify(col("Type")))
      .withColumn("_pred", mapLookup(col("_snake"), DrugCentral.dgidbPredicateMapping))
      .filter(col("_pred").isNotNull) // unmapped predicate → row skipped (logged in ref)
      .withColumn("ligand_id", concat(lit("GTOPDB:"), col("Ligand ID")))
      .localCheckpoint() // ligand-gene edges, gene-product edges and nodes re-enter

    val pubs = when(col("PubMed ID").isNotNull && col("PubMed ID") =!= "",
      transform(split(col("PubMed ID"), "\\|"), p => concat(lit("PMID:"), p)))

    val ligandGene = interactions
      .select(col("ligand_id"), col("_pred"),
        posexplode(split(col("Target Ensembl Gene ID"), "\\|")).as(Seq("_i", "gene")),
        col("Primary Target"), col("Affinity Units"), col("Affinity Median"),
        col("Endogenous"), col("PubMed ID"))
      .select(
        col("ligand_id").as(Biolink.Subject),
        col("_pred").as(Biolink.Predicate),
        concat(lit("ENSEMBL:"), col("gene")).as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        (col("Primary Target") === "true").as("primaryTarget"),
        col("Affinity Units").as("affinity_parameter"),
        when(col("Affinity Median").isNotNull && col("Affinity Median") =!= "",
          col("Affinity Median").cast("double")).as("affinity"),
        (col("Endogenous") === "true").as("endogenous"),
        pubs.as(Biolink.Publications),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit(Biolink.ManualAgent).as(Biolink.AgentType))

    // Human peptide ligands: gene → ligand has-gene-product via HGNC map
    val geneProduct = interactions
      .filter(col("Ligand Species").contains("Human") &&
        col("Ligand Gene Symbol").isNotNull && col("Ligand Gene Symbol") =!= "")
      .select(col("ligand_id"), col("PubMed ID"),
        explode(split(upper(col("Ligand Gene Symbol")), "\\|")).as("symbol"))
      .join(geneMap, Seq("symbol"))
      .select(
        concat(lit("HGNC:"), col("hgnc_id")).as(Biolink.Subject),
        lit(hasGeneProductPredicate).as(Biolink.Predicate),
        col("ligand_id").as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        lit(null).cast("boolean").as("primaryTarget"),
        lit(null).cast("string").as("affinity_parameter"),
        lit(null).cast("double").as("affinity"),
        lit(null).cast("boolean").as("endogenous"),
        pubs.as(Biolink.Publications),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit(Biolink.ManualAgent).as(Biolink.AgentType))

    // peptides: ligand has-part subunits
    val peptides = readTsv(spark, s"$dir/peptides.tsv")
      .filter(col("Species").contains("Human") &&
        col("Subunit ids").isNotNull && col("Subunit ids") =!= "")
      .withColumn("ligand_id", concat(lit("GTOPDB:"), col("Ligand id")))
      .localCheckpoint()
    val hasPart = peptides
      .select(col("ligand_id"), posexplode(split(col("Subunit ids"), "\\|")).as(Seq("_i", "subunit")))
      .select(
        col("ligand_id").as(Biolink.Subject),
        lit(hasPartPredicate).as(Biolink.Predicate),
        concat(lit("GTOPDB:"), col("subunit")).as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        lit(null).cast("boolean").as("primaryTarget"),
        lit(null).cast("string").as("affinity_parameter"),
        lit(null).cast("double").as("affinity"),
        lit(null).cast("boolean").as("endogenous"),
        lit(null).cast("array<string>").as(Biolink.Publications),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val edges = ligandGene.unionByName(geneProduct).unionByName(hasPart)

    def named(id: Column, name: Column) =
      Seq(id.as("id"), ascii(name).as("name"), array(lit(Biolink.NamedThing)).as("category"))
    val nodes = Seq(
      interactions.select(named(col("ligand_id"), col("Ligand")): _*),
      interactions.select(col("Target Ensembl Gene ID").as("genes"), col("Target Gene Symbol").as("names"))
        .select(posexplode(arrays_zip(split(col("genes"), "\\|"), split(col("names"), "\\|"))).as(Seq("_i", "z")))
        .select(named(concat(lit("ENSEMBL:"), col("z.0")), col("z.1")): _*),
      peptides.select(named(col("ligand_id"), col("Name")): _*),
      peptides.select(col("Subunit ids").as("ids"), col("Subunit names").as("names"))
        .select(posexplode(arrays_zip(split(col("ids"), "\\|"), split(col("names"), "\\|"))).as(Seq("_i", "z")))
        .select(named(concat(lit("GTOPDB:"), col("z.0")), col("z.1")): _*),
      geneProduct.join(geneMap.select(concat(lit("HGNC:"), col("hgnc_id")).as(Biolink.Subject),
          col("symbol")), Seq(Biolink.Subject))
        .select(named(col(Biolink.Subject), col("symbol")): _*)
    ).reduce(_.unionByName(_)).dropDuplicates("id")

    ExtractedGraph(nodes, edges)
  }
}
