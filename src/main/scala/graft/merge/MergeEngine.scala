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

  final case class Keyed(key: String, ordinal: Long, json: String)
  final case class MergedEntity(key: String, json: String, nMerged: Long)

  /** Order-aware property-bag merge aggregator (the one true custom
    * aggregate, SURVEY §2.10). */
  class EntityMergeAggregator(
      mismatchedAcc: Option[CollectionAccumulator[String]],
      droppedAcc: Option[CollectionAccumulator[String]])
    extends Aggregator[Keyed, List[(Long, String)], (String, Long)] with Serializable {

    def zero: List[(Long, String)] = Nil
    def reduce(b: List[(Long, String)], a: Keyed): List[(Long, String)] = (a.ordinal -> a.json) :: b
    def merge(b1: List[(Long, String)], b2: List[(Long, String)]): List[(Long, String)] = b1 ::: b2
    def finish(b: List[(Long, String)]): (String, Long) = b match {
      // singleton fast path: most keys are unmerged — pass the JSON
      // through untouched instead of a Jackson parse + reserialize
      case (_, only) :: Nil => (only, 0L)
      case _ =>
        val w = PropertyMerge.Warnings()
        val sorted = b.sortBy(_._1).map(_._2)
        val out = PropertyMerge.mergeAll(sorted, w)
        mismatchedAcc.foreach(acc => w.mismatched.foreach(acc.add))
        droppedAcc.foreach(acc => w.dropped.foreach(acc.add))
        (out, sorted.size - 1L)
    }
    def bufferEncoder: Encoder[List[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, String)]]()
    def outputEncoder: Encoder[(String, Long)] = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
  }

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
    * source rank in the high bits (file order of the reference), row id in
    * the low bits. monotonically_increasing_id is deterministic for a
    * deterministic scan order, which parquet/jsonl file listings give us. */
  def withOrdinal(dfs: Seq[DataFrame]): Seq[DataFrame] =
    dfs.zipWithIndex.map { case (df, i) =>
      df.withColumn("_ordinal", lit(i.toLong << 40) + monotonically_increasing_id())
    }

  /** Merge entities grouped by `keyCol`, folding property bags in
    * `_ordinal` order. Input columns minus helper columns become the JSON
    * payload. Returns (key, merged json, merged-away count). */
  def mergeByKey(df: DataFrame, keyCol: Column,
                 counters: Option[MergeCounters] = None): Dataset[MergedEntity] = {
    val spark = df.sparkSession
    import spark.implicits._
    val payloadCols = df.columns.filterNot(_ == "_ordinal")
    val ordinal = if (df.columns.contains("_ordinal")) col("_ordinal") else lit(0L)
    val keyed = df.select(
        keyCol.cast("string").as("key"),
        ordinal.as("ordinal"),
        to_json(struct(payloadCols.map(col): _*), Map("ignoreNullFields" -> "true")).as("json"))
      .as[Keyed]
    val agg = new EntityMergeAggregator(counters.map(_.mismatched), counters.map(_.dropped))
    keyed.groupByKey(_.key)
      .agg(agg.toColumn.name("merged"))
      .map { case (k, (js, n)) => MergedEntity(k, js, n) }
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
          s.fields.filterNot(_.name == "_ordinal").map(_.copy(nullable = true)))
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
    * groups that actually merged (ref orion/merging.py:280-295). */
  def edgeIdMapping(edges: DataFrame, customAttributes: Seq[String] = Nil): DataFrame = {
    edges
      .withColumn("_merge_id", MergeKeys.edgeId(edges, customAttributes))
      .groupBy(col("_merge_id"))
      .agg(sort_array(collect_list(col("id"))).as("pre_merge_ids"),
           count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("_merge_id").as("merged_edge_id"), col("pre_merge_ids"))
  }
}
