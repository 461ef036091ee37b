package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** KinAce kinase-substrate phosphorylation parser.
  *
  * Reference (parsers/KinAce/src/loadKinAce.py:8-100): CSV columns kinase
  * (0), substrate (2), p_site (4), primary_source (5), publications (7).
  * Every edge is the qualified biolink:affects form (qualified_predicate
  * causes, increased phosphorylation of the object), with KL/AT and
  * primary knowledge source decided by the upstream source
  * (PhosphoSitePlus → assertion/manual, iPTMNet → text-mining agent,
  * EPSD → not provided), KinAce itself as aggregator, ';'-separated PMIDs
  * ('NA'/empty → none), and the phosphorylation site as a list prop. */
object KinAce {

  val provenance = "infores:kinace"

  val inforesMapping: Map[String, String] = Map(
    "PhosphoSitePlus" -> "infores:psite-plus",
    "EPSD" -> "infores:epsd",
    "iPTMNet" -> "infores:iptmnet")

  private def mapLookup(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = spark.read.option("header", "true").csv(path)
    val cols = raw.columns
    val src = col(cols(5))

    val pubs = filter(
      transform(split(col(cols(7)), ";"), p => trim(p)),
      p => p =!= "" && p =!= "NA")

    val edges = raw.select(
      concat(lit("UniProtKB:"), col(cols(0))).as(Biolink.Subject),
      lit("biolink:affects").as(Biolink.Predicate),
      concat(lit("UniProtKB:"), col(cols(2))).as(Biolink.Object_),
      mapLookup(src, inforesMapping).as(Biolink.PrimaryKnowledgeSource),
      array(lit(provenance)).as(Biolink.AggregatorKnowledgeSources),
      lit("biolink:causes").as("qualified_predicate"),
      lit("increased").as("object_direction_qualifier"),
      lit("phosphorylation").as("object_aspect_qualifier"),
      array(col(cols(4))).as("phosphorylation_sites"),
      when(src === "PhosphoSitePlus", Biolink.KnowledgeAssertion)
        .otherwise(Biolink.NotProvided).as(Biolink.KnowledgeLevel),
      when(src === "PhosphoSitePlus", Biolink.ManualAgent)
        .when(src === "iPTMNet", "text_mining_agent")
        .otherwise(Biolink.NotProvided).as(Biolink.AgentType),
      when(size(pubs) > 0, transform(pubs, p => concat(lit("PMID:"), p)))
        .as(Biolink.Publications))

    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit("biolink:Protein")).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
