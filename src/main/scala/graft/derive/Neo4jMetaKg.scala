package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{Biolink, BiolinkModel}

/** Plater-style meta-KG + SRI test data (SURVEY §2.8 D7).
  *
  * Reference: orion/neo4j_meta_kg.py:17-195 — the reference can only
  * compute this against a LIVE Neo4j instance (its merged graph exists
  * only inside the database), so it issues a schema Cypher query, one
  * curie/attribute query per node type, and one example query per
  * meta-edge. Here the merged graph IS a DataFrame, so the whole derivation
  * is three aggregations over it — no serial per-type query loop, no
  * database round-trips, and the same two output files:
  * `neo4j_generated_meta_kg.json` and `neo4j_generated_test_data.json`.
  *
  * Faithful semantics:
  *  - nodes labeled ONLY biolink:NamedThing are excluded (the
  *    filter_named_thing lambda, :31), then biolink leaves are taken;
  *  - the schema is augmented with inverse predicates
  *    (bl_utils.invert_predicate, :42-53); derived inverse meta-edges get
  *    NO test edges (the inverted_predicate_tracker, :76);
  *  - per-type id_prefixes come from the observed curies (:141-165 — the
  *    reference sorts by the model's id_prefixes when the toolkit provides
  *    them and appends the rest; our vendored model carries none, which is
  *    exactly the reference's documented fallback, so prefixes sort
  *    lexicographically);
  *  - attributes use get_attribute_bl_info's shape and vendored maps
  *    (orion/biolink_utils.py:20-33,104-124): name/id skipped, mapped
  *    attribute_type_id/value_type_id, else biolink:Attribute +
  *    EDAM:data_0006;
  *  - test edges prefer an example with a qualified_predicate when the
  *    predicate can carry qualifiers, falling back to any example
  *    (:78-95); qualifier properties are every edge column whose name
  *    contains 'qualifie' (:103-113), prefixed biolink: when bare.
  */
object Neo4jMetaKg {

  /** attribute_type_map + value_type_map (biolink_utils.py:20-33). */
  private val attributeTypeMap = Map(
    "biolink:primary_knowledge_source" -> "biolink:primary_knowledge_source",
    "biolink:aggregator_knowledge_source" -> "biolink:aggregator_knowledge_source",
    "equivalent_identifiers" -> "biolink:same_as",
    "endogenous" -> "aragorn:endogenous")
  private val valueTypeMap = Map(
    "equivalent_identifiers" -> "metatype:uriorcurie",
    "biolink:primary_knowledge_source" -> "biolink:InformationResource",
    "biolink:aggregator_knowledge_source" -> "biolink:InformationResource",
    "endogenous" -> "xsd:boolean")

  /** get_attribute_bl_info (biolink_utils.py:104-124): None for name/id,
    * defaults biolink:Attribute / EDAM:data_0006 with the vendored
    * overrides. */
  def attributeInfo(name: String): Option[(String, String)] =
    if (name == "name" || name == "id") None
    else Some((
      attributeTypeMap.getOrElse(name, "biolink:Attribute"),
      valueTypeMap.getOrElse(name, "EDAM:data_0006")))

  /** predicate_has_qualifiers (biolink_utils.py:152-156) — the reference
    * hardcodes exactly these two. */
  val qualifierPredicates: Set[String] = Set("biolink:affects", "biolink:regulates")

  /** Leaf types with the NamedThing-only filter (:31-38): drop NamedThing
    * from the label set BEFORE taking leaves; nodes with nothing left are
    * excluded entirely. */
  private def filteredLeafTypes(category: Column): Column =
    BiolinkModel.leafCategories(filter(category, c => c =!= lit(Biolink.NamedThing)))

  private def nodeTypes(nodes: DataFrame): DataFrame =
    nodes.select(col("id"), explode(filteredLeafTypes(col("category"))).as("node_type"))

  /** The distinct (subject_type, predicate, object_type) schema — the
    * reference's one big Cypher schema query as a two-join aggregate. */
  def schemaTriples(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val types = nodeTypes(nodes)
    edges
      .join(types.select(col("id").as("_sid"), col("node_type").as("subject_type")),
        edges(Biolink.Subject) === col("_sid"))
      .join(types.select(col("id").as("_oid"), col("node_type").as("object_type")),
        edges(Biolink.Object_) === col("_oid"))
      .select(col("subject_type"), col(Biolink.Predicate).as("predicate"), col("object_type"))
      .distinct()
  }

  final case class MetaEdge(subject: String, predicate: String, obj: String,
                            inverted: Boolean)
  final case class TestEdge(subjectCategory: String, objectCategory: String,
                            predicate: String, subjectId: String, objectId: String,
                            qualifiers: Seq[(String, String)])

  /** Schema + inverse augmentation, driver-side over the (tiny) collected
    * triple set (:42-53). */
  def augmentedSchema(triples: Seq[(String, String, String)]): Seq[MetaEdge] = {
    val present = triples.toSet
    val direct = triples.map { case (s, p, o) => MetaEdge(s, p, o, inverted = false) }
    val inverses = triples.flatMap { case (s, p, o) =>
      BiolinkModel.invertPredicate(p).filterNot(inv => present.contains((o, inv, s)))
        .map(inv => MetaEdge(o, inv, s, inverted = true))
    }.distinct
    direct ++ inverses
  }

  /** One deterministic example edge per (subject_type, predicate,
    * object_type) — the reference's example query with its qualifier-first
    * preference (:78-95) as ONE window pass instead of up to two Cypher
    * queries per meta-edge. The qualified-example preference applies only
    * to predicates that can carry qualifiers (predicate_has_qualifiers,
    * biolink_utils.py:152-156), like the reference. The row's full JSON is
    * the final orderBy key so the window has a TOTAL order even when
    * several edges share subject/object but differ in qualifier values. */
  def exampleEdges(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val types = nodeTypes(nodes)
    val hasQp = edges.columns.contains("qualified_predicate")
    val qpCol = if (hasQp) col("qualified_predicate") else lit(null).cast("string")
    val joined = edges
      .join(types.select(col("id").as("_sid"), col("node_type").as("subject_type")),
        edges(Biolink.Subject) === col("_sid"))
      .join(types.select(col("id").as("_oid"), col("node_type").as("object_type")),
        edges(Biolink.Object_) === col("_oid"))
      .withColumn("_has_q",
        (qpCol.isNotNull &&
          col(Biolink.Predicate).isin(qualifierPredicates.toSeq: _*)).cast("int"))
      .withColumn("_row_json", to_json(struct(edges.columns.map(col): _*)))
    val w = Window.partitionBy(col("subject_type"), col(Biolink.Predicate), col("object_type"))
      .orderBy(col("_has_q").desc, col(Biolink.Subject), col(Biolink.Object_), col("_row_json"))
    joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn", "_has_q", "_row_json", "_sid", "_oid")
  }

  /** Per-type id prefixes + observed attribute (property) names. The
    * prefix is split(':')[0] like the reference (:153) — a colonless id
    * contributes itself, not an empty string. */
  def nodeTypeInfo(nodes: DataFrame): DataFrame = {
    val propCols = nodes.columns.filterNot(_ == "category")
    nodes
      .select(explode(filteredLeafTypes(col("category"))).as("node_type"),
        split(col("id"), ":").getItem(0).as("prefix"),
        filter(array(propCols.map(c =>
          when(col(c).isNotNull, lit(c)).otherwise(lit(null))): _*), _.isNotNull).as("props"))
      .groupBy(col("node_type"))
      .agg(array_sort(collect_set(col("prefix"))).as("id_prefixes"),
        array_sort(array_distinct(flatten(collect_list(col("props"))))).as("attributes"))
  }

  /** Generate both files (the reference's
    * generate_meta_kg_and_sri_test_data, :17-139). */
  def generate(nodes: DataFrame, edges: DataFrame, outDir: String): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    val triples = schemaTriples(nodes, edges).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val schema = augmentedSchema(triples)
    val typeInfo = nodeTypeInfo(nodes).collect()
      .map(r => r.getAs[String]("node_type") ->
        (r.getSeq[String](r.fieldIndex("id_prefixes")),
         r.getSeq[String](r.fieldIndex("attributes")))).toMap
    val examples = exampleEdges(nodes, edges).collect()
      .map(r => (r.getAs[String]("subject_type"), r.getAs[String](Biolink.Predicate),
        r.getAs[String]("object_type")) -> r).toMap

    val metaKg = mapper.createObjectNode()
    val nodesObj = metaKg.putObject("nodes")
    val typesInSchema = schema.flatMap(e => Seq(e.subject, e.obj)).distinct.sorted
    typesInSchema.foreach { t =>
      val (prefixes, attrs) = typeInfo.getOrElse(t, (Seq.empty[String], Seq.empty[String]))
      val n = nodesObj.putObject(t)
      val pfx = n.putArray("id_prefixes")
      prefixes.foreach(pfx.add)
      val attrArr = n.putArray("attributes")
      attrs.foreach { a =>
        attributeInfo(a).foreach { case (typeId, valueId) =>
          val o = attrArr.addObject()
          o.put("attribute_type_id", typeId)
          o.put("value_type_id", valueId)
          o.putArray("original_attribute_names").add(a)
        }
      }
    }
    val edgesArr = metaKg.putArray("edges")
    schema.sortBy(e => (e.subject, e.predicate, e.obj)).foreach { e =>
      val o = edgesArr.addObject()
      o.put("subject", e.subject)
      o.put("predicate", e.predicate)
      o.put("object", e.obj)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "neo4j_generated_meta_kg.json"), metaKg.toPrettyString)

    val testing = mapper.createObjectNode()
    testing.put("source_type", "primary")
    val testArr = testing.putArray("edges")
    schema.filterNot(_.inverted)
      .sortBy(e => (e.subject, e.predicate, e.obj))
      .foreach { e =>
        examples.get((e.subject, e.predicate, e.obj)).foreach { r =>
          val o = testArr.addObject()
          o.put("subject_category", e.subject)
          o.put("object_category", e.obj)
          o.put("predicate", e.predicate)
          o.put("subject_id", r.getAs[String](Biolink.Subject))
          o.put("object_id", r.getAs[String](Biolink.Object_))
          // qualifiers attach only for predicates that can carry them
          // (the reference's has_qualifiers gate, :103-113)
          val qualifierCols =
            if (qualifierPredicates.contains(e.predicate))
              r.schema.fieldNames.filter(_.contains("qualifie"))
            else Array.empty[String]
          val quals = qualifierCols.flatMap { c =>
            Option(r.getAs[Any](c)).map(v =>
              (if (c.startsWith("biolink:")) c else s"biolink:$c") -> v.toString)
          }
          if (quals.nonEmpty) {
            val qArr = o.putArray("qualifiers")
            quals.foreach { case (k, v) =>
              val q = qArr.addObject()
              q.put("qualifier_type_id", k)
              q.put("qualifier_value", v)
            }
          }
        }
      }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "neo4j_generated_test_data.json"), testing.toPrettyString)
  }
}
