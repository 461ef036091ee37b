package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph

/** UniRef similarity-cluster parser — XML consumed as a distributed
  * record scan (`lineSep = "</entry>"`), like [[Hmdb]].
  *
  * Reference (parsers/ViralProteome/src/loadUniRef.py:20-480): each
  * `<entry id="UniRef50_Q6GZX4">` is a similarity cluster; entries
  * carrying a "common taxon ID" property are scanned for
  * representativeMember/member dbReferences whose "NCBI taxonomy"
  * property is in the target taxon set (default: the reference's
  * fallback virus set, loadUniRef.py:93). Each captured member yields
  *  - member →RO:0002162 (in taxon)→ NCBITaxon node, and
  *  - cluster-representative →RO:HOM0000000 (homologous to)→ member
  *    for every captured member other than the first (the representative
  *    is the first captured pair, loadUniRef.py:440-465).
  * Nodes carry the similarity bin (UniRef50/90/100 from the entry id);
  * taxon nodes get OrganismTaxon-family categories and a taxon prop. */
object UniRef {

  /** Fallback virus taxa (loadUniRef.py:93). */
  val defaultTaxonSet: Set[String] = Set("654924", "2219562", "10493", "160691", "2219561")

  private def prop(block: Column, typ: String): Column = {
    val v = regexp_extract(block, "(?s)<property type=\"" + typ + "\" value=\"([^\"]*)\"", 1)
    when(v =!= "", v)
  }

  def parse(spark: SparkSession, path: String,
            taxonSet: Set[String] = defaultTaxonSet): ExtractedGraph = {
    val taxa = array(taxonSet.toSeq.map(lit): _*)

    val entries = spark.read.option("lineSep", "</entry>").text(path)
      .filter(col("value").contains("<entry"))
      .filter(col("value").contains("type=\"common taxon ID\""))
      .select(
        regexp_extract(col("value"), "<entry id=\"([^\"]+)\"", 1).as("entry_id"),
        regexp_extract_all(col("value"),
          lit("(?s)<(?:representativeMember|member)>(.*?)</(?:representativeMember|member)>"),
          lit(1)).as("member_blocks"))
      .filter(col("entry_id") =!= "")
      .withColumn("similarity_bin", element_at(split(col("entry_id"), "_"), 1))

    val entriesWithPairs = entries
      .withColumn("pairs",
        filter(
          transform(col("member_blocks"), m => struct(
            concat(lit("UniProtKB:"), prop(m, "UniProtKB accession")).as("uniprot"),
            concat(lit("NCBITaxon:"), prop(m, "NCBI taxonomy")).as("taxon"),
            coalesce(prop(m, "protein name"), lit("")).as("protein_name"),
            coalesce(prop(m, "source organism"), lit("")).as("organism"),
            prop(m, "NCBI taxonomy").as("raw_taxon"))),
          m => m.getField("raw_taxon").isNotNull &&
            m.getField("uniprot").isNotNull &&
            array_contains(taxa, m.getField("raw_taxon"))))
      .filter(size(col("pairs")) >= 1)
      .withColumn("rep", element_at(col("pairs"), 1).getField("uniprot"))
      .localCheckpoint()

    val members = entriesWithPairs
      .withColumn("m", explode(col("pairs")))
      .select(col("similarity_bin"), col("rep"),
        col("m.uniprot").as("uniprot"), col("m.taxon").as("taxon"),
        col("m.protein_name").as("protein_name"), col("m.organism").as("organism"))

    val taxonEdges = members.select(
      col("uniprot").as("subject"), lit("RO:0002162").as("predicate"),
      col("taxon").as("object"), col("similarity_bin"))
    val homEdges = members.filter(col("uniprot") =!= col("rep")).select(
      col("rep").as("subject"), lit("RO:HOM0000000").as("predicate"),
      col("uniprot").as("object"), col("similarity_bin"))
    val edges = taxonEdges.unionByName(homEdges)
      .withColumn("primary_knowledge_source", lit("infores:uniref"))

    val proteinNodes = members.select(col("uniprot").as("id"),
      col("protein_name").as("name"),
      array().cast("array<string>").as("category"),
      col("similarity_bin"), lit(null).cast("string").as("taxon"))
    val taxonNodes = members.select(col("taxon").as("id"), col("organism").as("name"),
      array(lit("biolink:OrganismTaxon"), lit("biolink:OntologyClass"),
        lit("biolink:NamedThing")).as("category"),
      col("similarity_bin"), col("taxon"))
    val nodes = proteinNodes.unionByName(taxonNodes).dropDuplicates("id")
    ExtractedGraph(nodes, edges)
  }
}
