package graft.derive

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{Biolink, BiolinkModel}

/** The published `schema.json` serialization
  * (ref orion/kgx_metadata.py:230-447):
  *
  *  - nodes grouped by their LEAF category set, each group carrying count,
  *    curie-prefix counts and attribute-occurrence counts (count-desc);
  *  - nodes_summary aggregated across groups;
  *  - edges keyed by (subject leaf categories, predicate, object leaf
  *    categories) with primary-knowledge-source / qualifier / attribute /
  *    endpoint-prefix counts;
  *  - edges_summary incl. predicates_by_knowledge_source.
  *
  * Spark plan: one aggregation per fact family over exploded
  * (group, item) pairs — everything that reaches the driver is
  * meta-cardinality (type sets × prefixes/attributes), never row-scale.
  */
object SchemaJson {

  private def leafCatsKey(categories: org.apache.spark.sql.Column) =
    array_join(array_sort(BiolinkModel.leafCategories(categories)), "|")

  /** Per-node-group facts: (catsKey, prefix) counts + (catsKey, attribute)
    * counts + group count, all collected at meta cardinality. */
  def build(nodes: DataFrame, edges: DataFrame): ObjectNode = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()

    val nodeAttrCols = nodes.columns.filterNot(Seq("id", "category").contains)
    val typed = nodes.select(col("id"), leafCatsKey(col("category")).as("cats"),
      regexp_extract(col("id"), "^([^:]+):", 1).as("prefix"),
      filter(array(nodeAttrCols.map(c =>
        when(col(c).isNotNull, lit(c)).otherwise(lit(null))): _*), _.isNotNull).as("attrs"))

    // ONE aggregation pass for both node fact families (prefix counts +
    // attribute counts) via tagged (kind, item) rows — formerly two
    // independent actions, i.e. two full node scans at production scale
    // item cast to string so empty qualifier/attribute column lists (an
    // ARRAY<NULL>-typed literal) still unify with the string families
    def fact(kind: String, item: org.apache.spark.sql.Column) =
      struct(lit(kind).as("kind"), item.cast("string").as("item"))
    val nodeFacts = typed.select(col("cats"), explode(concat(
        array(fact("p", col("prefix"))),
        transform(col("attrs"), a => fact("a", a)))).as("f"))
      .groupBy(col("cats"), col("f.kind").as("kind"), col("f.item").as("item"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val prefixCounts = nodeFacts.collect { case (cats, "p", item, n) => (cats, item, n) }
    val attrCounts = nodeFacts.collect { case (cats, "a", item, n) => (cats, item, n) }

    def countMap(node: ObjectNode, name: String, m: Seq[(String, Long)]): Unit = {
      val o = node.putObject(name)
      m.sortBy { case (k, v) => (-v, k) }.foreach { case (k, v) => o.put(k, v) }
    }

    // nodes: one entry per leaf-category set
    val nodesArr = root.putArray("nodes")
    val groups = prefixCounts.map(_._1).distinct.sorted
    groups.foreach { cats =>
      val o = nodesArr.addObject()
      val catArr = o.putArray("category")
      cats.split("\\|").filter(_.nonEmpty).foreach(catArr.add)
      val pfx = prefixCounts.filter(_._1 == cats).map(t => t._2 -> t._3).toSeq
      o.put("count", pfx.map(_._2).sum)
      countMap(o, "id_prefixes", pfx)
      countMap(o, "attributes", attrCounts.filter(_._1 == cats).map(t => t._2 -> t._3).toSeq)
    }
    // nodes_summary
    val nodesSummary = root.putObject("nodes_summary")
    nodesSummary.put("total_count", prefixCounts.map(_._3).sum)
    countMap(nodesSummary, "id_prefixes",
      prefixCounts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq)
    countMap(nodesSummary, "attributes",
      attrCounts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq)

    // edges keyed by (subject cats, predicate, object cats)
    val coreEdgeCols = Set(Biolink.Subject, Biolink.Object_, Biolink.Predicate,
      Biolink.PrimaryKnowledgeSource, Biolink.Sources)
    val qualifierCols = edges.columns.filter(Biolink.isQualifier)
    val edgeAttrCols = edges.columns.filterNot(c => coreEdgeCols.contains(c) || Biolink.isQualifier(c))

    val catsById = typed.select(col("id"), col("cats"))
    // ONE fused aggregation over tagged (kind, item) facts replaces the
    // former SIX actions over a persisted intermediate (triple counts,
    // pks/qualifier/attribute maps, subject/object prefix maps): every
    // edge emits exactly one "pks"/"sp"/"op" fact plus one fact per
    // present qualifier/attribute, so the per-triple row count is the sum
    // of its "pks" facts and each family regroups driver-side into the
    // same maps (incl. the "(none)" null spelling, which the prefix
    // families deliberately do NOT apply — unchanged from before)
    val edgeFacts = edges
      .join(catsById.select(col("id").as(Biolink.Subject), col("cats").as("s_cats")), Seq(Biolink.Subject))
      .join(catsById.select(col("id").as(Biolink.Object_), col("cats").as("o_cats")), Seq(Biolink.Object_))
      .select(col("s_cats"), col(Biolink.Predicate).as("p"), col("o_cats"),
        explode(concat(
          array(
            fact("pks", col(Biolink.PrimaryKnowledgeSource)),
            fact("sp", regexp_extract(col(Biolink.Subject), "^([^:]+):", 1)),
            fact("op", regexp_extract(col(Biolink.Object_), "^([^:]+):", 1))),
          transform(filter(array(qualifierCols.map(c =>
            when(col(c).isNotNull, lit(c)).otherwise(lit(null))): _*), _.isNotNull),
            q => fact("q", q)),
          transform(filter(array(edgeAttrCols.map(c =>
            when(col(c).isNotNull, lit(c)).otherwise(lit(null))): _*), _.isNotNull),
            a => fact("at", a)))).as("f"))
      .groupBy(col("s_cats"), col("p"), col("o_cats"),
        col("f.kind").as("kind"), col("f.item").as("item"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getLong(5)))

    def family(kind: String, noneForNull: Boolean)
        : Map[(String, String, String), Seq[(String, Long)]] =
      edgeFacts.collect { case (s, p, o, `kind`, item, n) =>
        ((s, p, o),
          (if (noneForNull) Option(item).getOrElse("(none)") else item) -> n)
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    val pksByKey = family("pks", noneForNull = true)
    val qualsByKey = family("q", noneForNull = true)
    val attrsByKey = family("at", noneForNull = true)
    val sPrefixByKey = family("sp", noneForNull = false)
    val oPrefixByKey = family("op", noneForNull = false)

    val edgeKeys = pksByKey.toSeq
      .map { case (key, pks) => (key, pks.map(_._2).sum) }
      .toArray.sortBy(_._1)

    val edgesArr = root.putArray("edges")
    edgeKeys.foreach { case (key @ (sCats, p, oCats), n) =>
      val o = edgesArr.addObject()
      val sArr = o.putArray("subject_category")
      sCats.split("\\|").filter(_.nonEmpty).foreach(sArr.add)
      o.put("predicate", p)
      val oArr = o.putArray("object_category")
      oCats.split("\\|").filter(_.nonEmpty).foreach(oArr.add)
      o.put("count", n)
      countMap(o, "primary_knowledge_sources", pksByKey.getOrElse(key, Nil))
      countMap(o, "qualifiers", qualsByKey.getOrElse(key, Nil))
      countMap(o, "attributes", attrsByKey.getOrElse(key, Nil))
      countMap(o, "subject_id_prefixes", sPrefixByKey.getOrElse(key, Nil))
      countMap(o, "object_id_prefixes", oPrefixByKey.getOrElse(key, Nil))
    }

    // edges_summary
    val allPks = pksByKey.values.flatten.toSeq
    val summary = root.putObject("edges_summary")
    summary.put("total_count", edgeKeys.map(_._2).sum)
    countMap(summary, "predicates",
      edgeKeys.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toSeq)
    countMap(summary, "primary_knowledge_sources",
      allPks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq)
    val byKs = summary.putObject("predicates_by_knowledge_source")
    pksByKey.toSeq
      .flatMap { case ((_, p, _), pks) => pks.map { case (ks, c) => (ks, p, c) } }
      .groupBy(_._1).toSeq.sortBy(_._1).foreach { case (ks, rows) =>
        val o = byKs.putObject(ks)
        rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
          .sortBy { case (k, v) => (-v, k) }.foreach { case (k, v) => o.put(k, v) }
      }
    countMap(summary, "qualifiers",
      qualsByKey.values.flatten.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq)
    countMap(summary, "attributes",
      attrsByKey.values.flatten.toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq)

    root
  }

  def write(nodes: DataFrame, edges: DataFrame, outFile: String): Unit = {
    val root = build(nodes, edges)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outFile).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), root.toPrettyString)
  }
}
