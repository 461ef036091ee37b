package graft.merge

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator
import graft.model.Biolink

/** The merge engine (SURVEY §2.5 A1-A8).
  *
  * The reference maintains two hand-rolled engines — an in-memory hash-agg
  * (orion/merging.py:490-578) and an external sort/spill/k-way-merge
  * (orion/merging.py:238-487) selected by a RESOURCE_HOGS cardinality hint.
  * Here both collapse into one `groupByKey(...).agg(mergeAgg)`: Spark's
  * partial hash aggregation + sort-based spill does the out-of-core work,
  * so the same code path scales from 60k rows to 100 TB by partitioning.
  *
  * Order sensitivity (SURVEY §7.5 risk 1): first-truthy-wins makes the fold
  * non-commutative, so every row carries an `ordinal` and the aggregation
  * buffer keeps (ordinal, json) pairs, folding in ordinal order at finish.
  * Group sizes are bounded by the number of sources contributing the same
  * entity (small), so buffering raw entities per key is safe even at scale —
  * the heavy lifting (hash partition + spill) stays in Spark's shuffle.
  */
object MergeEngine {

  final case class MergedEntity(key: String, json: String, nMerged: Long)

  /** Accumulator-backed warning channel (ref orion/merging.py:25-42). */
  final case class MergeCounters(
      mismatched: CollectionAccumulator[String],
      dropped: CollectionAccumulator[String]) {
    def mismatchedProperties: Set[String] = {
      import scala.jdk.CollectionConverters._
      mismatched.value.asScala.toSet
    }
    def droppedProperties: Set[String] = {
      import scala.jdk.CollectionConverters._
      dropped.value.asScala.toSet
    }
  }

  def counters(spark: SparkSession): MergeCounters = MergeCounters(
    spark.sparkContext.collectionAccumulator[String]("merge_mismatched_properties"),
    spark.sparkContext.collectionAccumulator[String]("merge_dropped_properties"))

  /** Attach a deterministic ordinal to a sequence of source DataFrames:
    * source rank in the top bits, then the `_file_rank` KgxIO.readJsonl
    * attaches (sorted-file order — Spark's scan partitions follow file
    * SIZE, so monotonically_increasing_id alone would fold files in size
    * order), then the row counter within a scan partition. Gzipped jsonl
    * is unsplittable (one partition per file), so within-file line order
    * is fully preserved for the KGX bundle case. */
  def withOrdinal(dfs: Seq[DataFrame]): Seq[DataFrame] =
    dfs.zipWithIndex.map { case (df, i) =>
      val fileRank =
        if (df.columns.contains("_file_rank")) coalesce(col("_file_rank"), lit(0)).cast("long")
        else lit(0L)
      val rowInPartition = monotonically_increasing_id().bitwiseAND(lit(0xFFFFFFFFL))
      df.withColumn("_ordinal",
          lit(i.toLong << 48) + shiftleft(fileRank, 32) + rowInPartition)
        .drop("_file_rank")
    }

  /** Merge entities grouped by `keyCol`, folding property bags in
    * `_ordinal` order. Input columns minus helper columns become the JSON
    * payload. Returns (key, merged json, merged-away count).
    *
    * The grouping is a NATIVE `collect_list(struct(ordinal, json))` — its
    * partial aggregation and object-hash buffers stay inside Spark's
    * codegen'd path, replacing the former typed Aggregator whose
    * `List[(Long, String)]` buffer paid an ExpressionEncoder round-trip on
    * every partial. The Jackson property fold runs only on the rare
    * multi-entity groups: singleton groups (the overwhelming majority)
    * pass their JSON through untouched via a `when(size = 1)` branch that
    * never invokes the UDF. */
  def mergeByKey(df: DataFrame, keyCol: Column,
                 counters: Option[MergeCounters] = None): Dataset[MergedEntity] = {
    val spark = df.sparkSession
    import spark.implicits._
    val payloadCols = df.columns.filterNot(c => c == "_ordinal" || c == "_file_rank")
    val ordinal = if (df.columns.contains("_ordinal")) col("_ordinal") else lit(0L)
    val keyed = df.select(
        keyCol.cast("string").as("key"),
        ordinal.as("ordinal"),
        to_json(struct(payloadCols.map(col): _*), Map("ignoreNullFields" -> "true")).as("json"))
    val mismatchedAcc = counters.map(_.mismatched)
    val droppedAcc = counters.map(_.dropped)
    val mergeGroup = udf { entries: Seq[org.apache.spark.sql.Row] =>
      val w = PropertyMerge.Warnings()
      val sorted = entries.sortBy(_.getLong(0)).map(_.getString(1))
      val out = PropertyMerge.mergeAll(sorted, w)
      mismatchedAcc.foreach(acc => w.mismatched.foreach(acc.add))
      droppedAcc.foreach(acc => w.dropped.foreach(acc.add))
      (out, sorted.size - 1L)
    }
    keyed.groupBy(col("key"))
      .agg(collect_list(struct(col("ordinal"), col("json"))).as("entries"))
      .select(col("key"),
        when(size(col("entries")) === 1,
          struct(col("entries")(0)("json").as("_1"), lit(0L).as("_2")))
          .otherwise(mergeGroup(col("entries"))).as("m"))
      .select(col("key"), col("m._1").as("json"), col("m._2").as("nMerged"))
      .as[MergedEntity]
  }

  /** Recover a typed DataFrame from merged JSON. Without a schema this
    * infers one (an extra pass — the reference's dynamic jsonl semantics,
    * SURVEY §1.2); pass the pre-merge schema to skip it: the merge never
    * changes a unified column's JSON type (lists stay lists, first-truthy
    * scalars keep the union type), so the input schema is exact. */
  def jsonToDf(merged: Dataset[MergedEntity],
               schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val spark = merged.sparkSession
    import spark.implicits._
    schema match {
      case Some(s) =>
        val clean = org.apache.spark.sql.types.StructType(
          s.fields.filterNot(f => f.name == "_ordinal" || f.name == "_file_rank")
            .map(_.copy(nullable = true)))
        merged.select(from_json(col("json"), clean).as("e")).select(col("e.*"))
      case None => spark.read.json(merged.map(_.json))
    }
  }

  /** A1/A3 — node merge: group by id (ref orion/merging.py:67-68,508-524). */
  def mergeNodes(nodes: DataFrame, counters: Option[MergeCounters] = None): Dataset[MergedEntity] =
    mergeByKey(nodes, col("id"), counters)

  /** A2/A3 — edge merge: group by the composite edge key
    * (ref orion/merging.py:526-558). */
  def mergeEdges(edges: DataFrame, customAttributes: Seq[String] = Nil,
                 counters: Option[MergeCounters] = None): Dataset[MergedEntity] =
    mergeByKey(edges, MergeKeys.edgeId(edges, customAttributes), counters)

  /** A6 — pre-merge edge-id mapping: post-merge id → pre-merge ids, only for
    * groups that actually merged (ref orion/merging.py:280-295).
    * Groups on the raw xxh64 long (8-byte shuffle key, no per-row hex
    * formatting); the hex digest is rendered and the surviving id lists
    * sorted only after the n>1 filter discards the singleton majority.
    *
    * Plan shape (verified via ExplainQuery on q15): exactly ONE Exchange —
    * partial ObjectHashAggregate (map-side collect_list+count combine) →
    * shuffle on the long hash → final aggregate. A "shared-shuffle"
    * variant folding this into mergeByKey's groupBy would save nothing
    * standalone and would force the merge path to carry id lists it
    * doesn't need; the composed pipeline calls them on different inputs
    * (merge on all columns' json, mapping on ids only), so the current
    * shape is the right one. */
  def edgeIdMapping(edges: DataFrame, customAttributes: Seq[String] = Nil): DataFrame = {
    edges
      .withColumn("_merge_hash", MergeKeys.xxh64Raw(MergeKeys.edgeKeyInput(edges, customAttributes)))
      .groupBy(col("_merge_hash"))
      .agg(collect_list(col("id")).as("pre_merge_ids"),
           count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(lower(lpad(hex(col("_merge_hash")), 16, "0")).as("merged_edge_id"),
        sort_array(col("pre_merge_ids")).as("pre_merge_ids"))
  }
}
