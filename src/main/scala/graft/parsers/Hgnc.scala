package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor
import graft.extract.Extractor.{EdgeRule, ExtractedGraph, Extraction}
import graft.model.Biolink

/** HGNC complete-set parser: gene → gene-family membership edges.
  *
  * Reference semantics (parsers/hgnc/src/loadHGNC.py:64-115):
  *  - rows with an empty `gene_group_id` are skipped;
  *  - the gene node is `hgnc_id` with name + {locus_group, symbol, location};
  *  - `gene_group_id`/`gene_group` are parallel '|'-separated lists — each
  *    pair becomes an `HGNC.FAMILY:<id>` node and a gene→family
  *    `RO:0002350` (member of) edge;
  *  - `pubmed_id` ('|'-separated) becomes `publications` as PMID curies;
  *  - knowledge_level=knowledge_assertion, agent_type=manual_agent.
  *
  * Spark-first: the per-row group loop is an arrays_zip + explode — one
  * scan, no driver iteration; the dedup the reference does through its
  * writer's id set is `dropDuplicates` inside the extractor.
  */
object Hgnc {

  val provenance = "infores:hgnc"
  val memberOfPredicate = "RO:0002350"

  def read(spark: SparkSession, path: String): DataFrame =
    Extractor.readDelimited(spark, path, sep = "\t", header = true)

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = read(spark, path)
      .filter(col("gene_group_id").isNotNull && col("gene_group_id") =!= "")
      .withColumn("_grp", explode(arrays_zip(
        split(col("gene_group_id"), "\\|").as("gid"),
        split(col("gene_group"), "\\|").as("gname"))))

    Extractor.extract(raw, Extraction(
      subjectId = col("hgnc_id"),
      subjectName = col("name"),
      subjectCategories = Seq("biolink:Gene"),
      subjectProperties = Map(
        "locus_group" -> col("locus_group"),
        "symbol" -> col("symbol"),
        "location" -> col("location")),
      objectId = concat(lit("HGNC.FAMILY:"), col("_grp.gid")),
      objectName = col("_grp.gname"),
      objectCategories = Seq("biolink:GeneFamily"),
      edges = Seq(EdgeRule(
        predicate = lit(memberOfPredicate),
        properties = Map(
          Biolink.KnowledgeLevel -> lit(Biolink.KnowledgeAssertion),
          Biolink.AgentType -> lit(Biolink.ManualAgent),
          Biolink.Publications -> when(
            col("pubmed_id").isNotNull && col("pubmed_id") =!= "",
            transform(split(col("pubmed_id"), "\\|"), p => concat(lit("PMID:"), p)))))),
      primaryKnowledgeSource = provenance))
  }
}
