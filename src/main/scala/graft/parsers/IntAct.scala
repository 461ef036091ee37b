package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** IntAct PSI-MI TAB parser.
  *
  * Reference (parsers/IntAct/src/loadIA.py:13-433): `intact.txt` inside
  * intact.zip; only rows where BOTH interactors are uniprotkb ids parse
  * (the '#' header falls out of the same filter):
  *  - publication id precedence pubmed → imex ('-'→':') → doi (validated);
  *  - detection method = the MI code inside `psi-mi:"MI:xxxx"(label)`;
  *  - rows grouped by (publication, interactor A, interactor B): duplicate
  *    rows collapse and their detection methods union into one
  *    '|'-joined value (sorted here — the reference joins an unordered
  *    set);
  *  - each group emits a protein-protein RO:0002436 edge (publication +
  *    detection_method props) and RO:0002162 in-taxon edges for both
  *    interactors;
  *  - protein nodes carry the uniprot alias as name and their taxon.
  */
object IntAct {

  val provenance = "infores:intact"
  val ppiPredicate = "RO:0002436"
  val inTaxonPredicate = "RO:0002162"

  private def uniprot(c: Column): Column = regexp_extract(c, "uniprotkb:([^|]+)", 1)
  private def uniprotAlias(c: Column): Column = regexp_extract(c, "uniprotkb:([^|(]+)", 1)
  private def taxonNum(c: Column): Column = regexp_extract(c, "taxid:(-?\\d+)", 1)

  /** pubmed → imex → doi precedence (loadIA.py:104-122). */
  def publicationId(c: Column): Column = {
    val pubmed = regexp_extract(c, "pubmed:(\\d+)", 1)
    val imex = regexp_extract(c, "imex:([^|]+)", 1)
    val doi = regexp_extract(c, "doi:(10\\.[0-9]{4,9}/[-._;()/:a-zA-Z0-9]+)", 1)
    when(pubmed =!= "", concat(lit("PMID:"), pubmed))
      .when(imex =!= "", regexp_replace(imex, "-", ":"))
      .when(doi =!= "", concat(lit("DOI:"), doi))
      .otherwise(lit(""))
  }

  def parse(spark: SparkSession, zipPath: String, member: String = "intact.txt"): ExtractedGraph = {
    val staging = java.nio.file.Files.createTempDirectory("graft-intact-").toString
    val staged = Archives.extractMembers(zipPath, staging, _ == member)
    require(staged.nonEmpty, s"member $member not found in $zipPath")
    val raw = spark.read.option("sep", "\t").option("header", "false").csv(staged.head)
    val c = raw.columns

    val base = raw
      .filter(col(c(0)).startsWith("u") && col(c(1)).startsWith("u"))
      .select(
        publicationId(col(c(8))).as("pub_id"),
        col(c(0)).as("raw_a"), col(c(1)).as("raw_b"),
        concat(lit("UniProtKB:"), uniprot(col(c(0)))).as("u_a"),
        concat(lit("UniProtKB:"), uniprot(col(c(1)))).as("u_b"),
        uniprotAlias(col(c(4))).as("alias_a"),
        uniprotAlias(col(c(5))).as("alias_b"),
        concat(lit("NCBITaxon:"), taxonNum(col(c(9)))).as("t_a"),
        concat(lit("NCBITaxon:"), taxonNum(col(c(10)))).as("t_b"),
        regexp_extract(col(c(6)), ":\"([^\"]+)\"", 1).as("detection"))

    val grouped = base
      .groupBy(col("pub_id"), col("raw_a"), col("raw_b"))
      .agg(first(col("u_a")).as("u_a"), first(col("u_b")).as("u_b"),
        first(col("alias_a")).as("alias_a"), first(col("alias_b")).as("alias_b"),
        first(col("t_a")).as("t_a"), first(col("t_b")).as("t_b"),
        array_join(array_sort(collect_set(col("detection"))), "|").as("detection_method"))
      .localCheckpoint() // ppi edges, taxon edges and nodes all re-enter

    val ppi = grouped.select(
      col("u_a").as(Biolink.Subject),
      lit(ppiPredicate).as(Biolink.Predicate),
      col("u_b").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      col("pub_id").as(Biolink.Publications),
      col("detection_method"),
      lit(Biolink.NotProvided).as(Biolink.KnowledgeLevel),
      lit(Biolink.NotProvided).as(Biolink.AgentType))

    val inTaxon = grouped.select(col("u_a").as(Biolink.Subject), col("t_a").as(Biolink.Object_))
      .unionByName(grouped.select(col("u_b").as(Biolink.Subject), col("t_b").as(Biolink.Object_)))
      .distinct()
      .select(col(Biolink.Subject), lit(inTaxonPredicate).as(Biolink.Predicate),
        col(Biolink.Object_), lit(provenance).as(Biolink.PrimaryKnowledgeSource),
        lit(null).cast("string").as(Biolink.Publications),
        lit(null).cast("string").as("detection_method"),
        lit(Biolink.NotProvided).as(Biolink.KnowledgeLevel),
        lit(Biolink.NotProvided).as(Biolink.AgentType))

    val proteinNodes = grouped
      .select(col("u_a").as("id"), col("alias_a").as("name"), col("t_a").as("taxon"))
      .unionByName(grouped.select(col("u_b").as("id"), col("alias_b").as("name"), col("t_b").as("taxon")))
      .dropDuplicates("id")
      .select(col("id"), col("name"), array(lit(Biolink.NamedThing)).as("category"), col("taxon"))
    val taxonNodes = grouped.select(col("t_a").as("id"))
      .unionByName(grouped.select(col("t_b").as("id")))
      .dropDuplicates("id")
      .select(col("id"), col("id").as("name"),
        array(lit("biolink:OrganismTaxon")).as("category"),
        lit(null).cast("string").as("taxon"))

    ExtractedGraph(proteinNodes.unionByName(taxonNodes), ppi.unionByName(inTaxon))
  }
}
