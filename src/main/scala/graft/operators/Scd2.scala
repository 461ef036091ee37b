package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder — the batch engine's
  * answer to MERGE INTO for versioned reference data (the shape ORION
  * faces when a source re-release changes node properties between graph
  * builds, and every warehouse faces for dimension tables).
  *
  * Given per-key effective-dated records (base snapshot ∪ change feeds,
  * unioned by the caller), the builder:
  *  1. compacts NO-OP versions — a record whose tracked attributes equal
  *     its predecessor's carries no information and would fragment the
  *     validity timeline;
  *  2. derives [valid_from, valid_to) windows per key, the open-ended
  *     current version flagged.
  *
  * Scale shape: both window passes share one hash partitioning on the
  * key, so the whole history build is a SINGLE shuffle; per-key state is
  * the version chain (bounded by change count, not table size). No
  * global window, no driver collect.
  */
object Scd2 {

  /** Build the version history. `records` must be unique per
    * (`keyCol`, `tsCol`); `attrCols` are the tracked attributes. Output
    * adds valid_from / valid_to (null-open) / is_current. */
  def history(records: DataFrame, keyCol: String, tsCol: String,
              attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // null-safe per-attribute change test: the first version always
    // survives (rn = 1 — an all-null first row must not be compacted away)
    val changed = attrCols
      .map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _)
    records
      .withColumn("__keep", row_number().over(w) === 1 || changed)
      .filter(col("__keep"))
      .drop("__keep")
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
