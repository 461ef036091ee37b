package graft.parsers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** ChEBI role-properties parser — a nodes-only source.
  *
  * Reference (parsers/chebi/src/loadChebiProperties.py:12-188):
  *  - compounds.tsv.gz: ascii names by CHEBI id (columns 6 / 8);
  *  - relation.tsv.gz triples run (FINAL)-[type]->(INIT) with the columns
  *    swapped relative to their names (the reference's own comment);
  *    type 4 = has_role, type 5 = is_a;
  *  - roles close over the role is_a hierarchy (rooted at CHEBI:50906);
  *    the abstract roles (role / biological role / chemical role /
  *    application) are ignored;
  *  - each surviving role becomes a CHEBI_ROLE_<name> boolean prop on the
  *    compound; compounds with no surviving role are skipped.
  *
  * The role hierarchy is meta-cardinality (few thousand edges) and closes
  * on the driver exactly like the reference; the compound-role assignment
  * and pivot stay distributed.
  */
object ChebiProperties {

  val provenance = "infores:chebi"
  val roleRoot = "CHEBI:50906"
  val rolesToIgnore: Set[String] = Set(
    "CHEBI:50906", "CHEBI:24432", "CHEBI:51086", "CHEBI:33232")

  def fixName(n: String): String = {
    var out = "CHEBI_ROLE_" + n.split("\\s+").mkString("_")
    out = out.replace("(", "_").replace(")", "_").replace(".*", "").replace("-", "_")
    while (out.contains("__")) out = out.replace("__", "_")
    out
  }

  def parse(spark: SparkSession, compoundsPath: String, relationsPath: String): ExtractedGraph = {
    val compounds = spark.read.option("sep", "\t").option("header", "true").csv(compoundsPath)
    val cc = compounds.columns
    val names = compounds.select(col(cc(6)).as("chebi_id"), col(cc(8)).as("name"))
      .localCheckpoint() // reused for compound names and role names

    val relations = spark.read.option("sep", "\t").option("header", "true").csv(relationsPath)
    val rc = relations.columns
    // (FINAL)-[type]->(INIT), columns swapped per the reference's comment
    val typed = relations.select(col(rc(1)).as("type"),
      concat(lit("CHEBI:"), col(rc(2))).as("final_id"),
      concat(lit("CHEBI:"), col(rc(3))).as("init_id"))

    // role is_a hierarchy: small — closed on the driver like the reference
    val isA = typed.filter(col("type") === "5")
      .select(col("init_id").as("parent"), col("final_id").as("child"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val childrenOf = isA.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val ancestors = scala.collection.mutable.Map[String, List[String]]()
    def walk(parent: String): Unit =
      childrenOf.getOrElse(parent, Nil).foreach { kid =>
        ancestors(kid) = parent :: ancestors.getOrElse(parent, Nil)
        walk(kid)
      }
    walk(roleRoot)

    // per-compound roles + their in-hierarchy ancestors, abstract roles out
    val ancMap = typedlit(ancestors.toMap)
    val roles = typed.filter(col("type") === "4")
      .select(col("final_id").as("chebi_id"), col("init_id").as("role"))
      .select(col("chebi_id"), explode(concat(array(col("role")),
        coalesce(element_at(ancMap, col("role")), array()))).as("role"))
      .distinct()
      .filter(!col("role").isin(rolesToIgnore.toSeq: _*))

    val withRoleNames = roles
      .join(names.select(col("chebi_id").as("role"), col("name").as("role_name")), Seq("role"))
    val fixUdf = udf((n: String) => fixName(n))
    val nodes = withRoleNames
      .select(col("chebi_id"), fixUdf(col("role_name")).as("prop"))
      .groupBy(col("chebi_id")).pivot("prop").agg(first(lit(true)))
      .join(names, Seq("chebi_id"))
      .withColumnRenamed("chebi_id", "id")
      .withColumn("category", array(lit("biolink:ChemicalEntity")))

    val emptyEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("subject", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("predicate", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("object", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("primary_knowledge_source", org.apache.spark.sql.types.StringType))))
    ExtractedGraph(nodes, emptyEdges)
  }
}
