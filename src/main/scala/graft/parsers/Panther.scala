package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** PANTHER sequence-classification parser.
  *
  * Reference (parsers/panther/src/loadPanther.py:19-433): the
  * PTHR*_human TSV (11 columns). `panther_sf_id` = `FAM:SUBFAM`; both
  * the family and the subfamily act as classification targets:
  *  - subfamily → family RO:0002350 (member of);
  *  - gene → family/subfamily member-of edges (gene id = second '|'
  *    segment of the gene_identifier, skipped when it's a bare "Gene"
  *    field, '='→':' upper-cased);
  *  - per family: `name#GO` lists fan out — molecular functions as
  *    enables (RO:0002327, assertion/manual), biological processes as
  *    involved-in (RO:0002331, assertion/manual), cellular components
  *    as located-in (RO:0001025);
  *  - the first '>'-segment of the pathway column becomes a
  *    PANTHER.PATHWAY has-participant (RO:0000057) edge onto the family.
  *
  * Spark-first: the reference loops family-by-family over a driver dict;
  * here each row explodes into its (family, subfamily) pair and each
  * `;`-list explodes relationally — same edges, one pass.
  */
object Panther {

  val provenance = "infores:panther"

  private def notProvided = Seq(
    lit(Biolink.NotProvided).as(Biolink.KnowledgeLevel),
    lit(Biolink.NotProvided).as(Biolink.AgentType))
  private def asserted = Seq(
    lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
    lit(Biolink.ManualAgent).as(Biolink.AgentType))

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = spark.read.option("sep", "\t").option("header", "false").csv(path)
    val c = raw.columns
    val base = raw.select(
        col(c(0)).as("gene_identifier"), col(c(2)).as("gene_name"),
        col(c(3)).as("sf_id"), col(c(4)).as("family_name"), col(c(5)).as("subfamily_name"),
        col(c(6)).as("mf"), col(c(7)).as("bp"), col(c(8)).as("cc"), col(c(10)).as("pathway"))
      .withColumn("fam", concat(lit("PANTHER.FAMILY:"), element_at(split(col("sf_id"), ":"), 1)))
      .withColumn("subfam", concat(col("fam"), lit(":"), element_at(split(col("sf_id"), ":"), 2)))
      .withColumn("gene_field", element_at(split(col("gene_identifier"), "\\|"), 2))
      .withColumn("gene_id",
        when(!col("gene_field").contains("Gene"),
          upper(regexp_replace(col("gene_field"), "=", ":"))))
      .localCheckpoint() // several edge families below re-enter

    // subfamily → family membership
    val subfamEdges = base.select(col("subfam").as(Biolink.Subject),
        lit("RO:0002350").as(Biolink.Predicate), col("fam").as(Biolink.Object_)).distinct()
      .select(Seq(col(Biolink.Subject), col(Biolink.Predicate), col(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource)) ++ notProvided: _*)

    // each row classifies under BOTH its family and subfamily
    val perFam = base.select(col("gene_id"), col("gene_name"),
      col("mf"), col("bp"), col("cc"), col("pathway"),
      explode(array(col("fam"), col("subfam"))).as("family"))

    val geneEdges = perFam.filter(col("gene_id").isNotNull)
      .select(Seq(col("gene_id").as(Biolink.Subject),
        lit("RO:0002350").as(Biolink.Predicate), col("family").as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource)) ++ notProvided: _*)
      .distinct()

    def goEdges(listCol: String, predicate: String, props: Seq[Column]): DataFrame =
      perFam.select(col("family"), explode(split(coalesce(col(listCol), lit("")), ";")).as("item"))
        .filter(length(col("item")) > 0)
        .select(Seq(col("family").as(Biolink.Subject), lit(predicate).as(Biolink.Predicate),
          element_at(split(col("item"), "#"), 2).as(Biolink.Object_),
          lit(provenance).as(Biolink.PrimaryKnowledgeSource)) ++ props: _*)
        .distinct()

    val mfEdges = goEdges("mf", "RO:0002327", asserted)
    val bpEdges = goEdges("bp", "RO:0002331", asserted)
    val ccEdges = goEdges("cc", "RO:0001025", notProvided)

    val pathwayFirst = element_at(split(coalesce(col("pathway"), lit("")), ">"), 1)
    val pathwayEdges = perFam
      .withColumn("p0", pathwayFirst)
      .filter(length(col("p0")) > 0)
      .select(Seq(concat(lit("PANTHER.PATHWAY:"), element_at(split(col("p0"), "#"), 2)).as(Biolink.Subject),
        lit("RO:0000057").as(Biolink.Predicate), col("family").as(Biolink.Object_),
        lit(provenance).as(Biolink.PrimaryKnowledgeSource)) ++ notProvided: _*)
      .distinct()

    val edges = Seq(subfamEdges, geneEdges, mfEdges, bpEdges, ccEdges, pathwayEdges)
      .reduce(_.unionByName(_))

    def named(id: Column, name: Column) =
      Seq(id.as("id"), name.as("name"), array(lit(Biolink.NamedThing)).as("category"))
    val goNames = Seq("mf", "bp", "cc").map { lc =>
      perFam.select(explode(split(coalesce(col(lc), lit("")), ";")).as("item"))
        .filter(length(col("item")) > 0)
        .select(named(element_at(split(col("item"), "#"), 2),
          element_at(split(col("item"), "#"), 1)): _*)
    }.reduce(_.unionByName(_))
    val nodes = Seq(
      base.select(named(col("fam"), col("family_name")): _*),
      base.select(named(col("subfam"), col("subfamily_name")): _*),
      base.filter(col("gene_id").isNotNull).select(named(col("gene_id"),
        when(length(col("gene_name")) > 1, col("gene_name")).otherwise(col("gene_id"))): _*),
      perFam.withColumn("p0", pathwayFirst).filter(length(col("p0")) > 0)
        .select(named(concat(lit("PANTHER.PATHWAY:"), element_at(split(col("p0"), "#"), 2)),
          element_at(split(col("p0"), "#"), 1)): _*),
      goNames
    ).reduce(_.unionByName(_)).dropDuplicates("id")

    ExtractedGraph(nodes, edges)
  }
}
