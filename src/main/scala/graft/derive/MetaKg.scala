package graft.derive

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Biolink

/** Meta-KG + QC aggregation plane (SURVEY §2.5 A10-A13, §2.8 D3/D6).
  * References: orion/meta_kg.py:50-187, orion/kgx_validation.py:25-213,
  * orion/kgx_metadata.py:295-447.
  */
object MetaKg {

  /** Node id → biolink LEAF types (J6): one row per category that is not a
    * strict ancestor of another of the node's categories
    * (find_biolink_leaves, orion/biolink_utils.py:44-60) — correct even
    * when categories aren't most-specific-first, unlike category[0]. */
  def nodeTypes(nodes: DataFrame): DataFrame =
    nodes.select(col("id"),
        explode(graft.model.BiolinkModel.leafCategories(col("category"))).as("node_type"))

  /** A11/D3 — meta-edges: (subject type, predicate, object type) with edge
    * count, attribute names, and one example edge triple. */
  def metaEdges(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val types = nodeTypes(nodes)
    val subjT = types.select(col("id").as("_sid"), col("node_type").as("subject_type"))
    val objT = types.select(col("id").as("_oid"), col("node_type").as("object_type"))
    val attributeCols = edges.columns
      .filterNot(Seq(Biolink.Subject, Biolink.Object_, Biolink.Predicate).contains)
    edges
      .join(subjT, edges(Biolink.Subject) === col("_sid"))
      .join(objT, edges(Biolink.Object_) === col("_oid"))
      .groupBy(col("subject_type"), col(Biolink.Predicate), col("object_type"))
      .agg(
        count(lit(1)).as("n_edges"),
        first(struct(col(Biolink.Subject).as("subject"), col(Biolink.Object_).as("object"))).as("example"),
        array_sort(array_distinct(flatten(collect_list(
          filter(array(attributeCols.map(c =>
            when(col(c).isNotNull, lit(c)).otherwise(lit(null))): _*), _.isNotNull))))).as("attributes"))
  }

  /** meta-nodes: leaf type → count + curie prefix set
    * (meta_kg.py:76-90 keys node metadata by leaf types). */
  def metaNodes(nodes: DataFrame): DataFrame =
    nodes
      .select(explode(graft.model.BiolinkModel.leafCategories(col("category"))).as("node_type"),
        // split(':')[0] like the reference — a colonless id contributes
        // itself, not an empty string
        split(col("id"), ":").getItem(0).as("prefix"))
      .groupBy(col("node_type"))
      .agg(count(lit(1)).as("n_nodes"),
        array_sort(collect_set(col("prefix"))).as("id_prefixes"))

  final case class QcResults(
      nodeCount: Long, edgeCount: Long,
      nodeTypeCounts: Map[String, Long],
      predicateCounts: Map[String, Long],
      primaryKsCounts: Map[String, Long],
      edgesMissingNodes: Long,
      invalidNodeTypes: Seq[String],
      deprecatedKnowledgeSources: Seq[String],
      invalidKnowledgeSources: Seq[String],
      warnings: Seq[String])

  /** D6 — graph QC (ref orion/kgx_validation.py:25-213): exact counts (QC
    * is exact in the reference — no approx_count_distinct), dangling-edge
    * anti-join, leaf-type counts, invalid-node-type check
    * (biolink_utils.py:202-233 get_valid_node_types) and infores-catalog
    * status for every knowledge source (deprecated/invalid → warnings). */
  def qc(nodes: DataFrame, edges: DataFrame,
         infores: graft.model.InforesCatalog = graft.model.InforesCatalog.vendored): QcResults = {
    // ONE aggregation pass per side instead of six (count / type counts /
    // predicate counts / pks counts / aggregator-ks set as separate
    // actions): every fact family explodes into tagged (kind, item) rows
    // and a single groupBy counts them all — the driver-side regrouping
    // below reproduces the former per-family maps exactly (incl. the
    // "(none)" null spellings). Each action is a full scan at production
    // scale, so the fusion is 6 scans → 2.
    def fact(kind: String, item: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      struct(lit(kind).as("kind"), item.cast("string").as("item"))
    val emptyFacts = typedlit(Seq.empty[(String, String)])
      .cast("array<struct<kind:string,item:string>>")
    val nodeFacts = nodes.select(explode(concat(
        array(fact("_cnt", lit(null))),
        coalesce(transform(graft.model.BiolinkModel.leafCategories(col("category")),
          t => fact("type", t)), emptyFacts))).as("f"))
      .groupBy(col("f.kind").as("kind"), col("f.item").as("item")).count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val hasPks = edges.columns.contains(Biolink.PrimaryKnowledgeSource)
    val hasAggKs = edges.columns.contains(Biolink.AggregatorKnowledgeSources)
    val edgeFacts = edges.select(explode(concat(Seq(
        array(fact("_cnt", lit(null)), fact("pred", col(Biolink.Predicate)))) ++
        (if (hasPks) Seq(array(fact("pks", col(Biolink.PrimaryKnowledgeSource)))) else Nil) ++
        (if (hasAggKs) Seq(coalesce(transform(col(Biolink.AggregatorKnowledgeSources),
          k => fact("aggks", k)), emptyFacts)) else Nil): _*)).as("f"))
      .groupBy(col("f.kind").as("kind"), col("f.item").as("item")).count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodeCount = nodeFacts.collect { case ("_cnt", _, n) => n }.sum
    val edgeCount = edgeFacts.collect { case ("_cnt", _, n) => n }.sum
    val typeCounts = nodeFacts.collect {
      case ("type", t, n) => Option(t).getOrElse("(none)") -> n
    }.toMap
    val invalidTypes = typeCounts.keys
      .filterNot(t => t == "(none)" || graft.model.BiolinkModel.isKnownCategory(t))
      .toSeq.sorted
    val predCounts = edgeFacts.collect { case ("pred", p, n) => p -> n }.toMap
    val pksCounts =
      if (hasPks) edgeFacts.collect {
        case ("pks", k, n) => Option(k).getOrElse("(none)") -> n
      }.toMap
      else Map.empty[String, Long]
    val aggKs: Seq[String] =
      edgeFacts.collect { case ("aggks", k, _) if k != null => k }.toSeq
    val allKs = (pksCounts.keys.filterNot(_ == "(none)") ++ aggKs).toSet
    val deprecatedKs = infores.deprecated(allKs)
    val invalidKs = infores.invalid(allKs)
    val ids = nodes.select(col("id"))
    val missing = edges
      .select(explode(array(col(Biolink.Subject), col(Biolink.Object_))).as("id"))
      .join(ids, Seq("id"), "left_anti").count()
    val warnings =
      (if (missing > 0) Seq(s"$missing edge endpoints missing from nodes") else Nil) ++
      (if (invalidTypes.nonEmpty) Seq(s"invalid node types: ${invalidTypes.mkString(", ")}") else Nil) ++
      deprecatedKs.map(ks => s"deprecated infores identifier: $ks") ++
      invalidKs.map(ks => s"invalid infores identifier: $ks")
    QcResults(nodeCount, edgeCount, typeCounts, predCounts, pksCounts, missing,
      invalidTypes, deprecatedKs, invalidKs, warnings)
  }

  /** D3 — the meta-KG file trio (ref orion/meta_kg.py:14-16,23-218):
    * meta_knowledge_graph.json (TRAPI nodes/edges), testing_data.json
    * (one example edge per meta-edge), example_edges.jsonl. Aggregates are
    * meta-edge-cardinality-sized → safe to collect. */
  def writeMetaKgFiles(nodes: DataFrame, edges: DataFrame, outDir: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val me = metaEdges(nodes, edges).collect()
    val mn = metaNodes(nodes).collect()

    val metaKg = mapper.createObjectNode()
    val nodesObj = metaKg.putObject("nodes")
    mn.sortBy(_.getAs[String]("node_type")).foreach { r =>
      val t = nodesObj.putObject(r.getAs[String]("node_type"))
      val pfx = t.putArray("id_prefixes")
      r.getSeq[String](r.fieldIndex("id_prefixes")).foreach(pfx.add)
    }
    val edgesArr = metaKg.putArray("edges")
    me.sortBy(r => (r.getAs[String]("subject_type"), r.getAs[String]("predicate"),
        r.getAs[String]("object_type"))).foreach { r =>
      val e = edgesArr.addObject()
      e.put("subject", r.getAs[String]("subject_type"))
      e.put("predicate", r.getAs[String]("predicate"))
      e.put("object", r.getAs[String]("object_type"))
      val attrs = e.putArray("attributes")
      r.getSeq[String](r.fieldIndex("attributes")).foreach(attrs.add)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "meta_knowledge_graph.json"), metaKg.toPrettyString)

    val testing = mapper.createObjectNode()
    val examples = testing.putArray("edges")
    val exampleLines = new StringBuilder
    me.foreach { r =>
      val ex = r.getStruct(r.fieldIndex("example"))
      val o = examples.addObject()
      o.put("subject_category", r.getAs[String]("subject_type"))
      o.put("predicate", r.getAs[String]("predicate"))
      o.put("object_category", r.getAs[String]("object_type"))
      o.put("subject_id", ex.getAs[String]("subject"))
      o.put("object_id", ex.getAs[String]("object"))
      exampleLines.append(o.toString).append('\n')
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "testing_data.json"), testing.toPrettyString)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "example_edges.jsonl"), exampleLines.toString)
  }

  /** A12-style schema summary: per (node type set) prefix/attribute counts,
    * per (s,p,o) triple counts — compact maps for schema.json. */
  def schemaSummary(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val types = nodeTypes(nodes)
    val subjT = types.select(col("id").as("_sid"), col("node_type").as("subject_type"))
    val objT = types.select(col("id").as("_oid"), col("node_type").as("object_type"))
    edges
      .join(subjT, edges(Biolink.Subject) === col("_sid"))
      .join(objT, edges(Biolink.Object_) === col("_oid"))
      .groupBy(col("subject_type"), col(Biolink.Predicate), col("object_type"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col(Biolink.Subject)).as("n_subjects"),
        count_distinct(col(Biolink.Object_)).as("n_objects"))
  }
}
