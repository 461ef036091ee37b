package graft.parsers

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** Multiomics EHR risk/may-treat KP parser.
  *
  * Reference (parsers/ehr/src/loadEHR.py:20-105): quoted CSV of
  * pre-normalized edges; subject_name/object_name/KG_type/category
  * columns dropped, the 95%-CI column parses as a JSON array, the known
  * statistical columns coerce to float/int, everything else passes
  * through; endpoint nodes emitted bare. */
object EhrMayTreat {

  val floatProps = Seq("auc_roc", "log_odds_ratio",
    "log_odds_ratio_95_ci_lower", "log_odds_ratio_95_ci_upper", "adjusted_p_value")
  val intProps = Seq("positive_patient_count", "negative_patient_count", "total_sample_size")
  val ignoreProps = Seq("subject_name", "object_name", "KG_type", "category")

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val raw = spark.read.option("header", "true").option("quote", "\"").csv(path)
    val dropped = raw.drop(ignoreProps: _*)
    val typed = dropped.columns.foldLeft(dropped) { (df, c) =>
      if (floatProps.contains(c)) df.withColumn(c, col(c).cast("double"))
      else if (intProps.contains(c)) df.withColumn(c, col(c).cast("long"))
      else if (c == "log_odds_ratio_95_ci")
        df.withColumn(c, from_json(col(c), org.apache.spark.sql.types.DataType.fromDDL("array<double>")))
      else df
    }
    val edges = typed.filter(col(Biolink.Subject).isNotNull && col(Biolink.Object_).isNotNull)
    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
