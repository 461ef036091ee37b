package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** STRING-DB protein-protein interaction parser.
  *
  * Reference (parsers/STRING/src/loadSTRINGDB.py:14-224):
  *  - space-delimited protein.links.full file, header, 16 columns;
  *  - rows with combined_score ≤ 500 are dropped;
  *  - predicates: one edge per evidence channel whose score > 750 (its
  *    channel predicate); when none crosses, a single fallback
  *    biolink:physically_interacts_with edge (HOMOLOGY and DATABASE never
  *    assign predicates);
  *  - KL/AT from the highest-scoring channel (first wins on ties, the
  *    reference's dict iteration order), overridden to knowledge_assertion
  *    (+ manual_agent when any high-conf channel is manual) when more than
  *    one channel is high-confidence;
  *  - ids are `<taxon>.<ensembl>` → ENSEMBL curie; a
  *    species_context_qualifier carries the taxon.
  *
  * Spark-first: the per-row predicate list is a filtered literal-struct
  * array exploded into edges — the multi-predicate fan-out (P1) without a
  * UDF; the argmax-with-first-tie channel pick is array_max over
  * (score, -position) structs.
  */
object StringDb {

  val provenance = "infores:string"

  /** channel → (column position, predicate or null, KL, AT), in the
    * reference's qualifier-dict order (tie-break order). */
  val channels: Seq[(String, Int, String, String, String)] = Seq(
    ("NEIGHBORHOOD", 2, "biolink:genetic_neighborhood_of", Biolink.Prediction, "data_pipeline"),
    ("FUSION", 4, "biolink:gene_fusion_with", Biolink.Prediction, "data_pipeline"),
    ("COOCCURANCE", 5, "biolink:genetically_interacts_with", "statistical_association", "data_pipeline"),
    ("HOMOLOGY", 6, null, Biolink.Prediction, Biolink.ComputationalModel),
    ("COEXPRESSION", 7, "biolink:coexpressed_with", "statistical_association", "data_pipeline"),
    ("EXPERIMENTS", 9, "biolink:physically_interacts_with", Biolink.KnowledgeAssertion, Biolink.ManualAgent),
    ("DATABASE", 11, null, Biolink.KnowledgeAssertion, Biolink.ManualAgent),
    ("TEXTMINING", 13, "biolink:interacts_with", Biolink.NotProvided, "text_mining_agent"))

  def parse(spark: SparkSession, path: String, taxonId: String,
            scoreThreshold: Int = 500, highConfThreshold: Int = 750): ExtractedGraph = {
    val raw = spark.read.option("sep", " ").option("header", "true").csv(path)
    val cols = raw.columns
    def score(pos: Int): Column = col(cols(pos)).cast("int")
    val prefixLen = taxonId.length + 1

    val baseCols = Seq(
      concat(lit("ENSEMBL:"), substring(col(cols(0)), prefixLen + 1, 1000)).as(Biolink.Subject),
      concat(lit("ENSEMBL:"), substring(col(cols(1)), prefixLen + 1, 1000)).as(Biolink.Object_)) ++
      channels.map { case (name, pos, _, _, _) => score(pos).as(s"_s_$name") }
    val base = raw.filter(score(15) > scoreThreshold).select(baseCols: _*)

    // high-confidence channel predicates; empty → fallback
    val predicateChannels = channels.filter(_._3 != null)
    val highConf = filter(array(predicateChannels.map { case (name, _, pred, _, _) =>
      when(col(s"_s_$name") > highConfThreshold, lit(pred)).otherwise(lit(null))
    }: _*), _.isNotNull)
    val predicates = when(size(highConf) > 0, highConf)
      .otherwise(array(lit("biolink:physically_interacts_with")))

    // argmax channel with first-wins ties: max (score, -position)
    val best = array_max(array(channels.zipWithIndex.map { case ((name, _, _, _, _), i) =>
      struct(col(s"_s_$name").as("s"), lit(-i).as("negpos"))
    }: _*))
    val bestIdx = -best.getField("negpos")
    val baseKl = channels.zipWithIndex.foldLeft(lit(Biolink.NotProvided)) {
      case (acc, ((_, _, _, kl, _), i)) => when(bestIdx === i, lit(kl)).otherwise(acc) }
    val baseAt = channels.zipWithIndex.foldLeft(lit(Biolink.NotProvided)) {
      case (acc, ((_, _, _, _, at), i)) => when(bestIdx === i, lit(at)).otherwise(acc) }

    // multi-high-conf override (loadSTRINGDB.py:142-151): count over ALL
    // qualifier channels, manual if any high-conf channel is manual
    val nHighConf = channels.map { case (name, _, _, _, _) =>
      when(col(s"_s_$name") > highConfThreshold, 1).otherwise(0) }.reduce(_ + _)
    val anyManualHighConf = channels.collect { case (name, _, _, _, at) if at == Biolink.ManualAgent =>
      col(s"_s_$name") > highConfThreshold }.reduce(_ || _)
    val kl = when(nHighConf > 1, Biolink.KnowledgeAssertion).otherwise(baseKl)
    val at = when(nHighConf > 1, when(anyManualHighConf, Biolink.ManualAgent).otherwise(lit("data_pipeline")))
      .otherwise(baseAt)

    val edges = base.select(
      col(Biolink.Subject),
      explode(predicates).as(Biolink.Predicate),
      col(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      concat(lit("NCBITaxon:"), lit(taxonId)).as("species_context_qualifier"),
      kl.as(Biolink.KnowledgeLevel),
      at.as(Biolink.AgentType))

    val nodes = base.select(col(Biolink.Subject).as("id"))
      .unionByName(base.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit("biolink:Protein")).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
