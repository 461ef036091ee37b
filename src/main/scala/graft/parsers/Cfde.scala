package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** CFDE "KG Assertions" parsers — LINCS and Metabolomics Workbench share
  * one assertion-dump shape (parsers/LINCS/src/loadLINCS.py,
  * parsers/MetabolomicsWorkbench/src/loadMetabolomicsWorkbench.py,
  * configured by cfde-config.yml):
  *  - per-type node CSVs: unnamed first column = the original (source)
  *    id, `label` = name, `type` (or the file's configured type) =
  *    category, id = primary id column with the secondary as fallback;
  *    a leading PUBCHEM prefix rewrites to PUBCHEM.COMPOUND;
  *  - edge CSV (source/relation/target in original ids): endpoints whose
  *    original id resolved to a null mapped id drop; resolvable endpoints
  *    rewrite to the mapped curie; the relation passes through the
  *    configured predicate map (unmapped relations pass through as-is);
  *  - fixed KL/AT: knowledge_assertion / data_analysis_pipeline.
  */
object Cfde {

  case class NodeFile(name: String, category: String, primaryId: String,
                      secondaryId: Option[String])
  case class Config(provenance: String, edgeFile: String,
                    predicateMapping: Map[String, String], nodeFiles: Seq[NodeFile])

  /** cfde-config.yml, LINCS document. */
  val lincs: Config = Config(
    provenance = "infores:lincs",
    edgeFile = "LINCS.edges.csv",
    predicateMapping = Map(
      "in_similarity_relationship_with" -> "biolink:chemically_similar_to",
      "negatively_regulates" -> "RO:0002212",
      "positively_regulates" -> "RO:0002213"),
    nodeFiles = Seq(
      NodeFile("LINCS.Gene.nodes.csv", "Gene", "HGNC", Some("OMIM")),
      NodeFile("LINCS.Compound.nodes.csv", "Compound", "PUBCHEM", None)))

  /** cfde-config.yml, MetabolomicsWorkbench document. */
  val metabolomicsWorkbench: Config = Config(
    provenance = "infores:metabolomics_workbench",
    edgeFile = "MW.edges.csv",
    predicateMapping = Map(
      "produces" -> "biolink:produces",
      "causally_influences" -> "biolink:regulates",
      "correlated_with_condition" -> "biolink:correlated_with"),
    nodeFiles = Seq(
      NodeFile("MW.Anatomy.nodes.csv", "Anatomy", "UBERON", Some("CHV")),
      NodeFile("MW.Disease or Phenotype.nodes.csv", "Disease or Phenotype", "MONDO", Some("CHV")),
      NodeFile("MW.Gene.nodes.csv", "Gene", "HGNC", Some("OMIM")),
      NodeFile("MW.Metabolite.nodes.csv", "Metabolite", "PUBCHEM", Some("PUBMED"))))

  def parse(spark: SparkSession, dir: String, config: Config): ExtractedGraph = {
    val nodeTables = config.nodeFiles.map { nf =>
      val raw = spark.read.option("header", "true").csv(s"$dir/${nf.name}")
      val originalId = col(raw.columns(0)) // unnamed first column
      val rawId = nf.secondaryId match {
        case Some(sec) => coalesce(col(nf.primaryId), col(sec))
        case None => col(nf.primaryId)
      }
      raw.select(
        when(rawId.startsWith("PUBCHEM"),
          regexp_replace(rawId, "^PUBCHEM", "PUBCHEM.COMPOUND")).otherwise(rawId).as("id"),
        originalId.as("original_id"),
        col("label").as("name"),
        array(coalesce(col("type"), lit(nf.category))).as("category"))
    }
    val allNodes = nodeTables.reduce(_ unionByName _)

    // mapping table: original id → mapped id (null id = unresolvable endpoint)
    val mapping = broadcast(allNodes
      .select(col("original_id"), col("id").as("mapped_id"))
      .filter(col("original_id").isNotNull)
      .dropDuplicates("original_id"))

    val nodes = allNodes
      .filter(col("id").isNotNull && col("original_id").isNotNull && col("name").isNotNull)
      .drop("original_id")
      .dropDuplicates("id")

    val predicate = config.predicateMapping.foldLeft(col("relation")) {
      case (acc, (from, to)) => when(col("relation") === from, lit(to)).otherwise(acc)
    }
    val rawEdges = spark.read.option("header", "true").csv(s"$dir/${config.edgeFile}")
    val edges = rawEdges
      .join(mapping.withColumnsRenamed(Map(
        "original_id" -> "src_orig", "mapped_id" -> "src_mapped")),
        col("source") === col("src_orig"), "left")
      .join(mapping.withColumnsRenamed(Map(
        "original_id" -> "tgt_orig", "mapped_id" -> "tgt_mapped")),
        col("target") === col("tgt_orig"), "left")
      // endpoints that resolved to a null id drop (the reference's
      // missing_mapping replace + drop_nulls)
      .filter(!(col("src_orig").isNotNull && col("src_mapped").isNull))
      .filter(!(col("tgt_orig").isNotNull && col("tgt_mapped").isNull))
      .select(
        coalesce(col("src_mapped"), col("source")).as(Biolink.Subject),
        predicate.as(Biolink.Predicate),
        coalesce(col("tgt_mapped"), col("target")).as(Biolink.Object_),
        lit(config.provenance).as(Biolink.PrimaryKnowledgeSource),
        lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
        lit("data_analysis_pipeline").as(Biolink.AgentType))
    ExtractedGraph(nodes, edges)
  }
}
