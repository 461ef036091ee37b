package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** HMDB metabolites parser — XML consumed as a distributed record scan.
  *
  * Reference (parsers/hmdb/src/loadHMDB.py:24-491) streams
  * hmdb_metabolites.xml looking for `<metabolite>` fragments; here the
  * same record split is a `lineSep = "</metabolite>"` text scan (the
  * UPheno OBO-stanza technique), with per-record field extraction as pure
  * column regexes — no XML library, no driver loop.
  *
  * Per metabolite (accession + name both required):
  *  - pathways: each `<pathway>` with a numeric smpdb_id becomes
  *    metabolite →RO:0000056→ SMPDB:SMP<0-padded-7-digits>
  *    (loadHMDB.py:353-419,473-490);
  *  - diseases: each `<disease>` with an omim_id AND at least one
  *    `<reference>` becomes metabolite →RO:0002610→ OMIM:<id>, with
  *    PMID publications when present (loadHMDB.py:257-351);
  *  - proteins: each `<protein>` with uniprot_id + protein_type becomes
  *    Enzyme* → UniProtKB →CTD:affects_abundance_of→ metabolite,
  *    Transport* → UniProtKB →CTD:increases_transport_of→ metabolite,
  *    anything else → metabolite →CTD:related_to→ UniProtKB
  *    (loadHMDB.py:155-255);
  *  - the metabolite node itself is only emitted when at least one edge
  *    was (loadHMDB.py:113-131).
  */
object Hmdb {

  val provenance = "infores:hmdb"

  private def tagText(block: Column, tag: String): Column = {
    val t = regexp_extract(block, s"(?s)<$tag>\\s*([^<]*?)\\s*</$tag>", 1)
    when(t =!= "", t)
  }

  private def blocks(record: Column, tag: String): Column =
    regexp_extract_all(record, lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))

  /** SMP id → zero-padded curie; non-numeric → null (loadHMDB.py:473-490). */
  private def smpdbCurie(smp: Column): Column = {
    val numeric = regexp_replace(smp, "^[SMP]+", "")
    when(numeric.rlike("^\\d+$"), concat(lit("SMPDB:SMP"), lpad(numeric, 7, "0")))
  }

  def parse(spark: SparkSession, zipPath: String,
            xmlMember: String = "hmdb_metabolites.xml"): ExtractedGraph = {
    val xmlPath =
      if (zipPath.endsWith(".zip")) {
        val staging = java.nio.file.Files.createTempDirectory("graft-hmdb-").toString
        val staged = Archives.extractMembers(zipPath, staging, _ == xmlMember)
        require(staged.nonEmpty, s"member $xmlMember not found in $zipPath")
        staged.head
      } else zipPath

    val records = spark.read.option("lineSep", "</metabolite>").text(xmlPath)
      .filter(col("value").contains("<metabolite"))
      .select(col("value").as("rec"))
      .withColumn("accession", tagText(col("rec"), "accession"))
      .withColumn("met_name", tagText(col("rec"), "name"))
      .filter(col("accession").isNotNull && col("met_name").isNotNull)
      .withColumn("metabolite_id", concat(lit("HMDB:"), col("accession")))

    // the first <name> in a record is the metabolite's own (child blocks
    // carry their own <name> tags, all after the metabolite header)

    val pathways = records
      .withColumn("p", explode(blocks(col("rec"), "pathway")))
      .withColumn("smpdb", smpdbCurie(tagText(col("p"), "smpdb_id")))
      .filter(col("smpdb").isNotNull)
      .select(col("metabolite_id"), col("met_name"),
        col("smpdb").as("other_id"), coalesce(tagText(col("p"), "name"), lit("")).as("other_name"),
        lit("RO:0000056").as(Biolink.Predicate),
        col("metabolite_id").as(Biolink.Subject), col("smpdb").as(Biolink.Object_),
        lit(null).cast("array<string>").as(Biolink.Publications))

    val diseases = records
      .withColumn("d", explode(blocks(col("rec"), "disease")))
      .withColumn("omim", tagText(col("d"), "omim_id"))
      .filter(col("omim").isNotNull)
      // a disease with no <reference> elements is skipped (loadHMDB.py:307-309)
      .filter(size(blocks(col("d"), "reference")) > 0)
      .withColumn("pmids",
        filter(transform(blocks(col("d"), "reference"), r => tagText(r, "pubmed_id")),
          p => p.isNotNull))
      .select(col("metabolite_id"), col("met_name"),
        concat(lit("OMIM:"), col("omim")).as("other_id"),
        coalesce(tagText(col("d"), "name"), lit("")).as("other_name"),
        lit("RO:0002610").as(Biolink.Predicate),
        col("metabolite_id").as(Biolink.Subject),
        concat(lit("OMIM:"), col("omim")).as(Biolink.Object_),
        when(size(col("pmids")) > 0,
          transform(col("pmids"), p => concat(lit("PMID:"), p))).as(Biolink.Publications))

    val proteins = records
      .withColumn("p", explode(blocks(col("rec"), "protein")))
      .withColumn("uniprot", tagText(col("p"), "uniprot_id"))
      .withColumn("ptype", tagText(col("p"), "protein_type"))
      .filter(col("uniprot").isNotNull && col("ptype").isNotNull)
      .withColumn("protein_id", concat(lit("UniProtKB:"), col("uniprot")))
      .select(col("metabolite_id"), col("met_name"),
        col("protein_id").as("other_id"),
        coalesce(tagText(col("p"), "name"), lit("")).as("other_name"),
        when(col("ptype").startsWith("Enzyme"), "CTD:affects_abundance_of")
          .when(col("ptype").startsWith("Transport"), "CTD:increases_transport_of")
          .otherwise("CTD:related_to").as(Biolink.Predicate),
        when(col("ptype").startsWith("Enzyme") || col("ptype").startsWith("Transport"),
          col("protein_id")).otherwise(col("metabolite_id")).as(Biolink.Subject),
        when(col("ptype").startsWith("Enzyme") || col("ptype").startsWith("Transport"),
          col("metabolite_id")).otherwise(col("protein_id")).as(Biolink.Object_),
        lit(null).cast("array<string>").as(Biolink.Publications))

    val all = pathways.unionByName(diseases).unionByName(proteins).localCheckpoint()

    val edges = all.select(
      col(Biolink.Subject), col(Biolink.Predicate), col(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType),
      col(Biolink.Publications))

    // metabolite nodes only for metabolites that produced ≥1 edge
    val metaboliteNodes = all.select(col("metabolite_id").as("id"), col("met_name").as("name"))
      .dropDuplicates("id")
    val otherNodes = all.select(col("other_id").as("id"), col("other_name").as("name"))
      .dropDuplicates("id")
    val nodes = metaboliteNodes.unionByName(otherNodes).dropDuplicates("id")
      .select(col("id"), col("name"), array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
