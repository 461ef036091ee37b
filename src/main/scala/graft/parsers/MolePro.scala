package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** MolePro parser — KGX-TSV node/edge files.
  *
  * Reference (parsers/molepro/src/loadMolePro.py:25-140 +
  * orion/biolink_constants.py:135-221): header-addressed TSV whose
  * columns may carry a `biolink:` prefix; only the known biolink
  * node/edge properties are read, '|'-separated list properties split,
  * rows missing required properties (node: id+category; edge:
  * subject/object/predicate/primary knowledge source) drop, and a
  * multi-valued primary knowledge source keeps its first entry. */
object MolePro {

  val nodeListProps = Set("category", "synonym", "publications", "xref")
  val edgeListProps = Set(Biolink.AggregatorKnowledgeSources, "publications", "xref")

  /** Read a KGX TSV with biolink:-prefix-tolerant headers. */
  def readKgxTsv(spark: SparkSession, path: String, listProps: Set[String]): DataFrame = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)
    val renamed = raw.columns.foldLeft(raw)((df, c) =>
      df.withColumnRenamed(c, c.stripPrefix("biolink:")))
    renamed.columns.foldLeft(renamed) { (df, c) =>
      if (listProps.contains(c)) df.withColumn(c, split(col(c), "\\|")) else df
    }
  }

  def parse(spark: SparkSession, nodesPath: String, edgesPath: String): ExtractedGraph = {
    val nodes = readKgxTsv(spark, nodesPath, nodeListProps)
      .filter(col("id").isNotNull && col("id") =!= "" &&
        col("category").isNotNull) // name is NOT required (REQUIRED minus NAME)
    val edges = readKgxTsv(spark, edgesPath, edgeListProps)
      .filter(Seq(Biolink.Subject, Biolink.Object_, Biolink.Predicate,
          Biolink.PrimaryKnowledgeSource)
        .map(c => col(c).isNotNull && col(c) =!= "").reduce(_ && _))
      // multi-valued primary ks keeps the first entry (loadMolePro.py:101)
      .withColumn(Biolink.PrimaryKnowledgeSource,
        element_at(split(col(Biolink.PrimaryKnowledgeSource), "\\|"), 1))
    ExtractedGraph(nodes, edges)
  }
}
