package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.sources.NQuads

/** MONDO superclass-property parser over the ubergraph N-Quads dump.
  *
  * Reference (parsers/MONDOProperties/src/loadMP.py:10-110):
  *  - only MONDO IRIs participate (iri tail `MONDO_123` → `MONDO:123`);
  *  - `normalizedInformationContent` literals below IC_CUTOFF=70 mark a
  *    class as a "property mondo" (general enough to become a flag);
  *  - rdfs:label literals name the flags;
  *  - rdfs:subClassOf triples connect each mondo to its superclasses;
  *  - every mondo whose superclass is a labeled property-mondo gets a
  *    boolean node property `MONDO_SUPERCLASS_<label>` (whitespace → '_',
  *    ','/ '/'/'-' cleaned) — a nodes-only source (no edges).
  *
  * Spark-first: the reference's three driver dicts become three filtered
  * projections of one triple scan, joined and PIVOTed into the dynamic
  * boolean columns the reference writes as JSON props.
  */
object MondoProperties {

  val provenance = "infores:mondo"
  val icCutoff = 70.0

  private def mondoCurie(iri: Column): Column =
    when(iri.contains("MONDO"),
      regexp_replace(element_at(split(iri, "/"), -1), "_", ":"))

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val triples = NQuads.read(spark, path)
      .withColumn("s_curie", mondoCurie(col("subject")))
      .filter(col("s_curie").isNotNull)
      .localCheckpoint() // three branches below re-enter this scan

    val propertyMondos = triples
      .filter(col("predicate").contains("normalizedInformationContent") &&
        col("object_literal").cast("double") < icCutoff)
      .select(col("s_curie").as("sc_curie")).distinct()

    val labels = triples
      .filter(col("predicate").contains("label") && col("object_literal").isNotNull)
      .select(col("s_curie").as("sc_curie"), col("object_literal").as("label"))

    val subclassOf = triples
      .filter(col("predicate").contains("subClassOf"))
      .withColumn("sc_curie", mondoCurie(col("object_iri")))
      .filter(col("sc_curie").isNotNull)
      .select(col("s_curie").as("mondo"), col("sc_curie"))

    val propName = concat(lit("MONDO_SUPERCLASS_"),
      regexp_replace(regexp_replace(col("label"), ",", ""), "[\\s/\\-]+", "_"))

    val flagged = subclassOf
      .join(propertyMondos, Seq("sc_curie"))
      .join(labels, Seq("sc_curie"))
      .select(col("mondo"), propName.as("prop"))
      .distinct()

    // dynamic boolean columns, like the reference's per-node JSON props
    val nodes = flagged.groupBy(col("mondo")).pivot("prop").agg(first(lit(true)))
      .withColumnRenamed("mondo", "id")
      .withColumn("name", lit(null).cast("string"))
      .withColumn("category", array(lit("biolink:Disease")))

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
