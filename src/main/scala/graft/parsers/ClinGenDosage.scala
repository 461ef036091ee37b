package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** ClinGen dosage-sensitivity parser (genes + regions curation lists).
  *
  * Reference (parsers/ClinGenDosageSensitivity/src/
  * loadClinGenDosageSensitivity.py:12-177):
  *  - both TSVs carry 5 metadata lines before the header row;
  *  - every data row fans out to up to two edges — haploinsufficiency and
  *    triplosensitivity — each emitted only when its score column is not
  *    "Not yet evaluated";
  *  - subject: genes file `NCBIGene:<Gene ID>`, regions file the ISCA id
  *    with '-' → ':';
  *  - object: the per-kind disease id, defaulting to MONDO:0700096 (human
  *    disease) when empty;
  *  - predicates are the raw curation phrases ("gene associated with
  *    condition" / "region associated with condition"), normalized
  *    downstream;
  *  - score → negation semantics (loadClinGenDosageSensitivity.py:160-177):
  *    with a disease id, scores 2/3/30 → negated=false, 0/1/40 →
  *    negated=true, -1 → negated=true + Status "Not planned to be
  *    evaluated", non-numeric → Status "Not yet evaluated"; without a
  *    disease id → negated=true.
  */
object ClinGenDosage {

  val provenance = "infores:clingen"
  val humanDisease = "MONDO:0700096"
  val skipRows = 5

  /** Text scan that drops the first `n` physical lines, then parses the
    * remainder as a header-ed TSV. Single-file curation lists: the
    * zipWithIndex order is the file order (partitions are offset-ordered). */
  private[parsers] def readSkipping(spark: SparkSession, path: String, n: Int): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path).rdd.zipWithIndex()
      .filter(_._2 >= n).map(_._1).toDS()
    spark.read.option("sep", "\t").option("header", "true").csv(lines)
  }

  private def edgesFor(rows: DataFrame, subjectId: Column, predicate: String): DataFrame = {
    def kind(scoreCol: String, descCol: String, diseaseCol: String, tag: String) = {
      val score = coalesce(col(scoreCol), lit(""))
      val disease = coalesce(col(diseaseCol), lit(""))
      val scoreInt = score.try_cast("int")
      rows
        .filter(score =!= "Not yet evaluated")
        // unexpected numeric scores raise in the reference (row errored out)
        .filter(scoreInt.isNull || scoreInt.isin(0, 1, 2, 3, 30, 40, -1))
        .select(
          subjectId.as(Biolink.Subject),
          lit(predicate).as(Biolink.Predicate),
          when(disease =!= "", disease).otherwise(lit(humanDisease)).as(Biolink.Object_),
          lit(provenance).as(Biolink.PrimaryKnowledgeSource),
          (if (tag == "HI") col(descCol) else lit(null).cast("string"))
            .as("HAPLOINSUFFICIENCY_DESCRIPTION"),
          (if (tag == "HI") col(scoreCol) else lit(null).cast("string"))
            .as("HAPLOINSUFFICIENCY_SCORE"),
          (if (tag == "TS") col(descCol) else lit(null).cast("string"))
            .as("TRIPLOSENSITIVITY_DESCRIPTION"),
          (if (tag == "TS") col(scoreCol) else lit(null).cast("string"))
            .as("TRIPLOSENSITIVITY_SCORE"),
          when(disease =!= "",
            when(scoreInt.isNull, lit("Not yet evaluated"))
              .when(scoreInt === -1, lit("Not planned to be evaluated")))
            .as("Status"),
          when(disease =!= "",
            when(scoreInt.isin(2, 3, 30), lit(false))
              .when(scoreInt.isin(0, 1, 40, -1), lit(true)))
            .otherwise(lit(true)).as(Biolink.Negated))
    }
    kind("Haploinsufficiency Score", "Haploinsufficiency Description",
        "Haploinsufficiency Disease ID", "HI")
      .unionByName(kind("Triplosensitivity Score", "Triplosensitivity Description",
        "Triplosensitivity Disease ID", "TS"))
  }

  def parse(spark: SparkSession, genesPath: String, regionsPath: String): ExtractedGraph = {
    val genes = readSkipping(spark, genesPath, skipRows)
    val regions = readSkipping(spark, regionsPath, skipRows)
    val edges =
      edgesFor(genes, concat(lit("NCBIGene:"), col("Gene ID")),
          "gene associated with condition")
        .unionByName(edgesFor(regions,
          regexp_replace(col("#ISCA ID"), "-", ":"),
          "region associated with condition"))
    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
