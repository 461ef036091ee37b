package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** Text Mining Provider (targeted) KP parser.
  *
  * Reference (parsers/textminingkp/src/loadTMKP.py:10-140): gz TSV of
  * 19 columns — subject/predicate/object, ten qualifier columns (kept
  * when non-empty), confidence score, '|'-separated supporting study and
  * publication ids, and a JSON attribute blob whose
  * biolink:TextMiningResult entries yield (supporting_text, document)
  * pairs joined into a '|'-separated `sentences` prop. KL not provided,
  * text-mining agent, TMKP as primary knowledge source.
  *
  * Spark-first: the nested JSON attribute blob parses with from_json +
  * higher-order filters — no row-at-a-time json.loads.
  */
object TextMiningKp {

  val provenance = "infores:text-mining-provider-targeted"

  private val qualifierCols: Seq[(Int, String)] = Seq(
    3 -> "qualified_predicate",
    4 -> "subject_aspect_qualifier", 5 -> "subject_direction_qualifier",
    6 -> "subject_part_qualifier", 7 -> "subject_form_or_variant_qualifier",
    8 -> "object_aspect_qualifier", 9 -> "object_direction_qualifier",
    10 -> "object_part_qualifier", 11 -> "object_form_or_variant_qualifier",
    12 -> "anatomical_context_qualifier")

  private val attrSchema = "array<struct<value_type_id:string," +
    "attributes:array<struct<attribute_type_id:string,value:string>>>>"

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = spark.read.option("sep", "\t").option("header", "false").csv(path)
    val c = raw.columns

    // TextMiningResult attributes → interleaved (supporting_text, document)
    val attrs = from_json(col(c(18)), org.apache.spark.sql.types.DataType.fromDDL(attrSchema))
    val sentences = array_join(flatten(transform(
      filter(attrs, a => a.getField("value_type_id") === "biolink:TextMiningResult"),
      a => array(
        coalesce(try_element_at(filter(a.getField("attributes"),
          n => n.getField("attribute_type_id") === "biolink:supporting_text"), lit(1))
          .getField("value"), lit("")),
        coalesce(try_element_at(filter(a.getField("attributes"),
          n => n.getField("attribute_type_id") === "biolink:supporting_document"), lit(1))
          .getField("value"), lit("NA"))))), "|")

    val baseCols = Seq(
      col(c(0)).as(Biolink.Subject), col(c(1)).as(Biolink.Predicate),
      col(c(2)).as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      split(col(c(17)), "\\|").as(Biolink.Publications),
      col(c(15)).cast("double").as("tmkp_confidence_score"),
      sentences.as("sentences"),
      split(col(c(16)), "\\|").as("tmkp_ids"),
      lit(Biolink.NotProvided).as(Biolink.KnowledgeLevel),
      lit("text_mining_agent").as(Biolink.AgentType)) ++
      qualifierCols.map { case (i, name) =>
        when(col(c(i)).isNotNull && col(c(i)) =!= "", col(c(i))).as(name)
      }

    val edges = raw
      .filter(col(c(0)).isNotNull && col(c(1)).isNotNull && col(c(2)).isNotNull)
      .select(baseCols: _*)

    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
