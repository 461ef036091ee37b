package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** GWAS Catalog associations parser.
  *
  * Reference (parsers/GWASCatalog/src/loadGWASCatalog.py:18-359): zip
  * member TSV keyed by position (PUBMEDID 1, RISK_ALLELE 20, SNPS 21,
  * MERGED 22, SNP_ID_CURRENT 23, P_VALUE 27, TRAIT_URIS 35):
  *  - HLA rows ('*' in SNPS) skipped;
  *  - MERGED=1 with a current rsid wins outright (DBSNP:rs<current>);
  *    otherwise each rs variant pairs with its risk allele
  *    (DBSNP:rsX-A, '?' alleles and non-rs tokens dropped);
  *  - trait URIs become EFO/ORPHANET/HP/NCIT/MONDO/GO curies from the
  *    URL tail; rows with no usable variant or trait skip;
  *  - every variant × trait pair is an RO:0002200 (has phenotype) edge
  *    with the PMID, p-value (0 → Double.MinPositiveValue) and
  *    assertion/manual KL-AT;
  *  - duplicate (s,p,o) edges merge: distinct publications, min p-value.
  *    (The reference's custom_merge_edges overwrites the publication list
  *    with the newest edge's — an apparent accumulation bug; the union
  *    here is the evident intent.)
  */
object GwasCatalog {

  val provenance = "infores:gwas-catalog"
  val hasPhenotypePredicate = "RO:0002200"

  private val traitPrefixes: Seq[(String, Int, String)] = Seq(
    // (url-tail prefix, chars to strip, curie prefix)
    ("EFO", 4, "EFO"), ("Orphanet", 9, "ORPHANET"), ("HP", 3, "HP"),
    ("NCIT", 5, "NCIT"), ("MONDO", 6, "MONDO"), ("GO", 3, "GO"))

  private def traitCurie(tail: Column): Column =
    coalesce(traitPrefixes.map { case (p, strip, curie) =>
      when(tail.startsWith(p),
        concat(lit(curie + ":"), tail.substr(lit(strip + 1), lit(4096))))
    } :+ lit(null).cast("string"): _*)

  def parse(spark: SparkSession, zipPath: String, member: String): ExtractedGraph = {
    val staging = java.nio.file.Files.createTempDirectory("graft-gwas-").toString
    val staged = Archives.extractMembers(zipPath, staging, _ == member)
    require(staged.nonEmpty, s"member $member not found in $zipPath")
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(staged.head)
    val cols = raw.columns

    val base = raw.select(
        col(cols(1)).as("pubmed_id"), col(cols(20)).as("risk_allele"),
        col(cols(21)).as("snps"), col(cols(22)).as("merged"),
        col(cols(23)).as("snp_id_current"), col(cols(27)).as("p_value_str"),
        col(cols(35)).as("trait_uris"))
      .filter(!coalesce(col("snps"), lit("")).contains("*")) // HLA nomenclature

    // risk-allele lookup: 'rsX-A' tokens → map rsX → A
    val alleleMap = map_from_entries(filter(
      transform(split(coalesce(col("risk_allele"), lit("")), "[,;x\\s]+"),
        t => struct(element_at(split(t, "-"), 1).as("k"),
          when(size(split(t, "-")) > 1, element_at(split(t, "-"), 2)).as("v"))),
      e => e.getField("v").isNotNull))

    val parsedVariants = filter(
      transform(
        filter(split(coalesce(col("snps"), lit("")), "[,;x\\s]+"),
          v => v.startsWith("rs")),
        v => {
          val allele = element_at(alleleMap, v)
          when(allele.isNotNull && allele =!= "?", concat(lit("DBSNP:"), v, lit("-"), allele))
            .otherwise(concat(lit("DBSNP:"), v))
        }),
      _.isNotNull)

    val variants = when(
      col("merged") === "1" &&
        col("snp_id_current").isNotNull && col("snp_id_current") =!= "",
      array(concat(lit("DBSNP:rs"), col("snp_id_current"))))
      .otherwise(parsedVariants)

    val traits = filter(
      transform(split(coalesce(col("trait_uris"), lit("")), "[,\\s]+"),
        u => traitCurie(element_at(split(u, "/"), -1))),
      _.isNotNull)

    val pValue = expr("try_cast(p_value_str AS DOUBLE)")

    val exploded = base
      .withColumn("_variants", variants).withColumn("_traits", traits)
      .filter(size(col("_variants")) > 0 && size(col("_traits")) > 0)
      .withColumn("_p", when(pValue === 0.0, lit(java.lang.Double.MIN_VALUE)).otherwise(pValue))
      .select(explode(col("_variants")).as("variant_id"), col("_traits"),
        col("pubmed_id"), col("_p"))
      .select(col("variant_id"), explode(col("_traits")).as("trait_id"),
        col("pubmed_id"), col("_p"))

    // (s,p,o) merge: distinct publications, min p-value
    val edges = exploded
      .groupBy(col("variant_id"), col("trait_id"))
      .agg(
        array_sort(collect_set(concat(lit("PMID:"), col("pubmed_id")))).as(Biolink.Publications),
        min(col("_p")).as("p_value"))
      .select(
        col("variant_id").as(Biolink.Subject),
        lit(hasPhenotypePredicate).as(Biolink.Predicate),
        col("trait_id").as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        col(Biolink.Publications), col("p_value"),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val variantNodes = edges.select(col(Biolink.Subject).as("id"))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit("biolink:SequenceVariant")).as("category"))
    val traitNodes = edges.select(col(Biolink.Object_).as("id"))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit("biolink:DiseaseOrPhenotypicFeature")).as("category"))
    ExtractedGraph(variantNodes.unionByName(traitNodes), edges)
  }
}
