package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** BindingDB binding-affinity parser.
  *
  * Reference (parsers/BINDING/src/loadBINDINGDB.py:20-229): a zip member
  * TSV keyed by column position (PubChem CID 31, UniProt chain 44, pKi 8,
  * pIC50 9, pKd 10, pEC50 11, PMID 19, assay 20, patent 21). The
  * reference accumulates a driver-side dict keyed by
  * (ligand, protein, measure); here that's a groupBy over the exploded
  * (row × measure) pairs — same semantics, distributed:
  *  - rows missing ligand or protein are skipped;
  *  - '>' affinities (dead compounds) and zero/unparseable values carry
  *    no affinity AND no publication/assay/patent contribution;
  *  - groups with no valid affinity disappear;
  *  - affinity = -log10(mean(nM)·1e-9) rounded to 2, supporting values
  *    likewise;
  *  - measure → predicate map (the literal "{DGIDB}:inhibitor" string is
  *    the reference's own emitted value — reproduced for parity);
  *  - knowledge_assertion / manual_agent.
  */
object BindingDb {

  val provenance = "infores:bindingdb"

  /** measure → predicate (loadBINDINGDB.py:72-77; the pKi value is the
    * reference's literal, un-interpolated string). */
  val measureToPredicate: Map[String, String] = Map(
    "pKi" -> "{DGIDB}:inhibitor",
    "pIC50" -> "CTD:decreases_activity_of",
    "pKd" -> "RO:0002436",
    "pEC50" -> "CTD:increases_activity_of")

  private val measureCols = Seq("pKi" -> 8, "pIC50" -> 9, "pKd" -> 10, "pEC50" -> 11)

  private def mapLookup(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  /** -log10(nM · 1e-9), the pKi/pKd/pIC50/pEC50 scale. */
  private def negLog(nm: Column): Column = -log10(nm * lit(1e-9))

  def parse(spark: SparkSession, zipPath: String, member: String): ExtractedGraph = {
    val staging = java.nio.file.Files.createTempDirectory("graft-bindingdb-").toString
    val staged = Archives.extractMembers(zipPath, staging, _ == member)
    require(staged.nonEmpty, s"member $member not found in $zipPath")
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(staged.head)
    val cols = raw.columns

    val base = raw
      .select(
        col(cols(31)).as("ligand"), col(cols(44)).as("protein"),
        col(cols(19)).as("pmid"), col(cols(20)).as("aid"), col(cols(21)).as("patent"),
        explode(array(measureCols.map { case (name, idx) =>
          struct(lit(name).as("measure"), col(cols(idx)).as("value"))
        }: _*)).as("m"))
      .filter(col("ligand").isNotNull && col("ligand") =!= "" &&
        col("protein").isNotNull && col("protein") =!= "")
      .select(col("ligand"), col("protein"), col("pmid"), col("aid"), col("patent"),
        col("m.measure").as("measure"), col("m.value").as("value"))
      .filter(col("value").isNotNull && col("value") =!= "")
      // '>' = dead compound; strip '<'/','/' ' and parse; 0 → invalid
      .filter(!col("value").contains(">"))
      .withColumn("nm", expr("try_cast(regexp_replace(value, '[<, ]', '') AS DOUBLE)"))
      .filter(col("nm").isNotNull && col("nm") =!= 0.0)

    val grouped = base
      .groupBy(col("ligand"), col("protein"), col("measure"))
      .agg(
        collect_list(col("nm")).as("nms"),
        array_distinct(filter(collect_list(
          when(col("pmid").isNotNull && col("pmid") =!= "", concat(lit("PMID:"), col("pmid")))),
          _.isNotNull)).as("publications"),
        array_distinct(filter(collect_list(
          when(col("aid").isNotNull && col("aid") =!= "", concat(lit("PUBCHEM.AID:"), col("aid")))),
          _.isNotNull)).as("pubchem_assay_ids"),
        array_distinct(filter(collect_list(
          when(col("patent").isNotNull && col("patent") =!= "", concat(lit("PATENT:"), col("patent")))),
          _.isNotNull)).as("patent_ids"))

    val edges = grouped.select(
      concat(lit("PUBCHEM.COMPOUND:"), col("ligand")).as(Biolink.Subject),
      mapLookup(col("measure"), measureToPredicate).as(Biolink.Predicate),
      concat(lit("UniProtKB:"), col("protein")).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      round(negLog(aggregate(col("nms"), lit(0.0d), (a, v) => a + v) / size(col("nms"))), 2)
        .as("affinity"),
      col("measure").as("affinity_parameter"),
      transform(col("nms"), v => round(negLog(v), 2)).as("supporting_affinities"),
      when(size(col("publications")) > 0, col("publications")).as(Biolink.Publications),
      when(size(col("pubchem_assay_ids")) > 0, col("pubchem_assay_ids")).as("pubchem_assay_ids"),
      when(size(col("patent_ids")) > 0, col("patent_ids")).as("patent_ids"),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
