package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** Clinical Trials KP parser (biothings multiomics clinical-trials dump).
  *
  * Reference (parsers/clinicaltrials/src/loadCTKP.py:47-218):
  *  - nodes TSV: id/name/category passthrough;
  *  - edges TSV: per-row comma-aligned lists (nctid, phase, status,
  *    enrollment, enrollment_type) zip into one TRAPI
  *    has_supporting_study_result attribute JSON string per study, with
  *    study_size falling back to -1 on unparseable enrollment and
  *    tested_intervention "unsure" for mentioned_in_trials_for;
  *  - provenance splits on the predicate: biolink:treats edges are
  *    first-party (primary infores:biothings-multiomics-clinicaltrials,
  *    aggregator infores:aact, supporting infores:clinicaltrials); all
  *    other predicates are primary infores:clinicaltrials with both others
  *    as aggregators;
  *  - max_research_phase = str(float(max phase)); source_record_urls from
  *    the edge id.
  */
object Ctkp {

  val provenance = "infores:biothings-multiomics-clinicaltrials"
  val aactInfores = "infores:aact"
  val ctgovInfores = "infores:clinicaltrials"
  val sourceRecordUrl = "https://db.systemsbiology.net/gestalt/cgi-pub/KGinfo.pl?id="

  def parse(spark: SparkSession, nodesTsv: String, edgesTsv: String): ExtractedGraph = {
    val nodesRaw = spark.read.option("sep", "\t").option("header", "true").csv(nodesTsv)
    val nc = nodesRaw.columns
    val nodes = nodesRaw.select(col(nc(0)).as("id"), col(nc(1)).as("name"),
      array(col(nc(2))).as("category")).dropDuplicates("id")

    val raw = spark.read.option("sep", "\t").option("header", "true").csv(edgesTsv)
    val c = raw.columns
    def csvList(i: Int): Column = split(coalesce(col(c(i)).cast("string"), lit("")), ",")

    val isTreats = col(c(2)) === "biolink:treats"
    val testedIntervention =
      when(col(c(2)) === "biolink:mentioned_in_trials_for", lit("unsure")).otherwise(lit("yes"))

    // one TRAPI attribute JSON per supporting study, zipping the five lists
    val studies = zip_with(
      arrays_zip(csvList(9), csvList(10), csvList(14)).as("a"),
      arrays_zip(csvList(16), csvList(17)).as("b"),
      (a, b) => to_json(struct(
        lit("has_supporting_study_result").as("attribute_type_id"),
        a.getField("0").as("value"),
        array(
          struct(lit("id").as("attribute_type_id"), a.getField("0").as("value")),
          struct(lit("tested_intervention").as("attribute_type_id"),
            testedIntervention.as("value")),
          struct(lit("phase").as("attribute_type_id"), a.getField("1").as("value")),
          struct(lit("status").as("attribute_type_id"), a.getField("2").as("value")),
          struct(lit("study_size").as("attribute_type_id"),
            coalesce(b.getField("0").try_cast("int").cast("string"), lit("-1")).as("value"))
        ).as("attributes"))))

    val maxPhase = array_max(transform(csvList(10), p => p.cast("double")))

    val edges = raw.select(
      col(c(1)).as(Biolink.Subject),
      col(c(2)).as(Biolink.Predicate),
      col(c(3)).as(Biolink.Object_),
      col(c(0)).as("id"),
      when(isTreats, lit(provenance)).otherwise(lit(ctgovInfores))
        .as(Biolink.PrimaryKnowledgeSource),
      when(isTreats, array(lit(aactInfores)))
        .otherwise(array(lit(aactInfores), lit(provenance)))
        .as(Biolink.AggregatorKnowledgeSources),
      col(c(7)).as(Biolink.KnowledgeLevel),
      col(c(8)).as(Biolink.AgentType),
      format_number(coalesce(maxPhase, lit(0.0)), 1).as("max_research_phase"),
      lit(false).as("elevate_to_prediction"),
      array(concat(lit(sourceRecordUrl), col(c(0)))).as("source_record_urls"),
      when(isTreats, lit(ctgovInfores)).as("supporting_data_source"),
      studies.as("attributes"))
    ExtractedGraph(nodes, edges)
  }
}
