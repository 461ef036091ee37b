package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph

/** Scent KP parser (odorant → verbal-scent-descriptor edges).
  *
  * Reference (parsers/scent/src/loadScent.py:30-173):
  *  - two term-list files yield node-only rows: the IFA VSD list (ids are
  *    the space→underscore term, categories verbal_scent_descriptor +
  *    ifa_vsd, headerless) and the human-generated VSD list (header row,
  *    category verbal_scent_descriptor only);
  *  - the odorant id list yields bare odorant/ChemicalEntity nodes;
  *  - the human-curated edge CSV links odorant ids to "SCENT:"-prefixed
  *    VSDs with the row's own predicate column;
  *  - the cosine-distance edge CSV does the same but keeps only rows with
  *    distance ≤ 1.0 and carries the distance as an edge property.
  *  Bare-term node ids in the list files are intentionally NOT
  *  SCENT:-prefixed, mirroring the reference. */
object Scent {

  val provenance = "infores:Scent"
  val cosDistThreshold = 1.0

  def parse(spark: SparkSession, dir: String): ExtractedGraph = {
    def vsdId(c: org.apache.spark.sql.Column) = regexp_replace(trim(c), " ", "_")

    val ifa = spark.read.csv(s"$dir/primary_ifa_vsd_list.txt")
      .select(vsdId(col("_c0")).as("id"), trim(col("_c0")).as("name"),
        array(lit("verbal_scent_descriptor"), lit("ifa_vsd")).as("category"))
    val human = spark.read.option("header", "true").csv(s"$dir/sor_dataset_human_generated_vsd_list.txt")
    val humanVsd = human
      .select(vsdId(col(human.columns(0))).as("id"), trim(col(human.columns(0))).as("name"),
        array(lit("verbal_scent_descriptor")).as("category"))
    val odorants = spark.read.csv(s"$dir/sor_dataset_robokop_id_list.txt")
      .select(col("_c0").as("id"), lit(null).cast("string").as("name"),
        array(lit("odorant"), lit("biolink:ChemicalEntity")).as("category"))

    val humanEdges = spark.read.option("header", "true")
      .csv(s"$dir/sor_dataset_mmod_sor_dataset_vsd_edges.csv")
      .toDF("drug_id", "verbal_scent", "pred")
      .select(col("drug_id").as("subject"), col("pred").as("predicate"),
        concat(lit("SCENT:"), regexp_replace(col("verbal_scent"), " ", "_")).as("object"),
        col("verbal_scent").as("vsd_name"),
        lit(null).cast("double").as("cosine_distance"))
    val cosEdges = spark.read.option("header", "true")
      .csv(s"$dir/sor_dataset_mmod_primary_ifa_vsd_cos_dist_weighted_edges.csv")
      .toDF("drug_id", "verbal_scent", "pred", "distance")
      .filter(col("distance").cast("double") <= cosDistThreshold)
      .select(col("drug_id").as("subject"), col("pred").as("predicate"),
        concat(lit("SCENT:"), regexp_replace(col("verbal_scent"), " ", "_")).as("object"),
        col("verbal_scent").as("vsd_name"),
        col("distance").cast("double").as("cosine_distance"))
    val edges = humanEdges.unionByName(cosEdges)
      .withColumn("primary_knowledge_source", lit(provenance))

    val edgeSubjectNodes = edges.select(col("subject").as("id"),
      lit(null).cast("string").as("name"),
      array(lit("odorant"), lit("biolink:ChemicalEntity")).as("category"))
    val edgeObjectNodes = edges.select(col("object").as("id"), col("vsd_name").as("name"),
      array(lit("verbal_scent_descriptor")).as("category"))
    val nodes = (ifa unionByName humanVsd unionByName odorants
      unionByName edgeSubjectNodes unionByName edgeObjectNodes).dropDuplicates("id")
    ExtractedGraph(nodes, edges.drop("vsd_name"))
  }
}
