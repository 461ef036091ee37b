package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.merge.{GraphMerger, MergeEngine, MergeKeys}
import graft.model.Biolink

/** KGX/graph-plane operators (SURVEY §2.4-§2.8) demonstrated over the
  * synthetic star schema: the star tables are projected into node/edge
  * shapes, then the real engine operators run on them.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Nodes derived from two overlapping "sources" (customer universe):
    * source A = customers from orders, source B = customer master. */
  private def customerNodes(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val a = Tables.orders(s, dir)
      .groupBy(concat(lit("CUST:"), col("o_custkey")).as("id"))
      .agg(array_sort(collect_set(col("o_orderpriority"))).as("priorities"))
      .withColumn("name", lit(null).cast("string"))
    val b = Tables.customer(s, dir)
      .select(concat(lit("CUST:"), col("c_custkey")).as("id"),
        col("c_name").as("name"),
        array(col("c_mktsegment")).as("segments"))
    (a, b)
  }

  /** A1-A3 via the real MergeEngine Aggregator: union two sources, merge by
    * id with order-aware property semantics, and project a stable view.
    * Oracle: SQL equivalent of the simple-case semantics (first non-null name
    * in source order, union'd sorted list props). */
  private val q20: Q = (s, dir) => {
    val (a, b) = customerNodes(s, dir)
    val unioned = MergeEngine.withOrdinal(Seq(a, b))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val merged = MergeEngine.jsonToDf(MergeEngine.mergeNodes(unioned), Some(unioned.schema))
    // no orderBy: the correctness harness sorts rows before hashing
    merged.select(
        col("id"),
        col("name"),
        array_join(array_sort(col("priorities")), ",").as("priorities"),
        array_join(array_sort(col("segments")), ",").as("segments"))
  }

  private val q20Sql =
    """SELECT 'CUST:' || k AS id,
              max(name) AS name,
              list_aggregate(list_sort(list_distinct(flatten(list(priorities)))), 'string_agg', ',') AS priorities,
              list_aggregate(list_sort(list_distinct(flatten(list(segments)))), 'string_agg', ',') AS segments
       FROM (
         SELECT o_custkey AS k, NULL AS name,
                list_distinct(list(DISTINCT o_orderpriority)) AS priorities, [] AS segments
         FROM orders GROUP BY o_custkey
         UNION ALL
         SELECT c_custkey AS k, c_name AS name, [], [c_mktsegment] FROM customer)
       GROUP BY k ORDER BY id"""

  /** A2 — composite edge merge key (xxh64, reference-identical digests):
    * orders become CUST→ORDER edges; count pre-merge rows per key.
    * Oracle can't reproduce xxh64, so the key's *inputs* are also output and
    * the key itself is checked for uniqueness by construction (group by the
    * natural key in SQL, same cardinality). */
  private val q21: Q = (s, dir) => {
    val e = Tables.lineitem(s, dir).select(
      concat(lit("ORDER:"), col("l_orderkey")).as(Biolink.Subject),
      lit("contains_part").as(Biolink.Predicate),
      concat(lit("PART:"), col("l_partkey")).as(Biolink.Object_),
      lit("infores:synth").as(Biolink.PrimaryKnowledgeSource))
    e.withColumn("edge_id", MergeKeys.edgeId(e))
      .groupBy(col("subject"), col("predicate"), col("object"),
               col("primary_knowledge_source"), col("edge_id"))
      .agg(count(lit(1)).as("n_premerge"))
      .groupBy()
      .agg(count(lit(1)).as("n_edges"),
           count_distinct(col("edge_id")).as("n_distinct_ids"),
           sum(col("n_premerge")).as("n_rows"))
  }

  private val q21Sql =
    """SELECT count(*) AS n_edges, count(*) AS n_distinct_ids, CAST(sum(n) AS BIGINT) AS n_rows FROM (
         SELECT l_orderkey, l_partkey, count(*) AS n
         FROM lineitem GROUP BY l_orderkey, l_partkey)"""

  /** J1/J2/N2 — normalization join with 1→N split: a curie map derived from
    * nation (each nation id normalizes to its region, and nations in region
    * 0 additionally split to a second id), applied to supplier nodes.
    * Explode-the-map-then-join = the split cross-product. */
  private val q22: Q = (s, dir) => {
    val n = Tables.nation(s, dir)
    // 1→N normalization map: NATION:x → [REGION:r] or [REGION:r, RSPLIT:r]
    val normMap = n.select(
      concat(lit("NATION:"), col("n_nationkey")).as("orig"),
      when(col("n_regionkey") === 0,
        array(concat(lit("REGION:"), col("n_regionkey")),
              concat(lit("RSPLIT:"), col("n_regionkey"))))
        .otherwise(array(concat(lit("REGION:"), col("n_regionkey")))).as("norm_ids"))
      .select(col("orig"), explode(col("norm_ids")).as("norm_id"))
    val suppliers = Tables.supplier(s, dir).select(
      concat(lit("SUPP:"), col("s_suppkey")).as("id"),
      concat(lit("NATION:"), col("s_nationkey")).as("nation_curie"))
    suppliers.join(broadcast(normMap), col("nation_curie") === col("orig"))
      .select(col("id"), col("norm_id"))
      .orderBy(col("id"), col("norm_id"))
  }

  private val q22Sql =
    """WITH norm_map AS (
         SELECT 'NATION:' || n_nationkey AS orig,
                unnest(CASE WHEN n_regionkey = 0
                       THEN ['REGION:' || n_regionkey, 'RSPLIT:' || n_regionkey]
                       ELSE ['REGION:' || n_regionkey] END) AS norm_id
         FROM nation)
       SELECT 'SUPP:' || s_suppkey AS id, norm_id
       FROM supplier JOIN norm_map ON 'NATION:' || s_nationkey = orig
       ORDER BY id, norm_id"""

  /** D1 — redundant-KG ancestor expansion: explode each edge into one copy
    * per ancestor predicate from a broadcast hierarchy table
    * (ref orion/redundant_kg.py:51-106). Events map to predicates. */
  private val q23: Q = (s, dir) => {
    import s.implicits._
    val predicateOf =
      when(col("event_type") === "click", "biolink:directly_physically_interacts_with")
        .when(col("event_type") === "view", "biolink:physically_interacts_with")
        .when(col("event_type") === "purchase", "biolink:causes")
        .when(col("event_type") === "signup", "biolink:contributes_to")
        .otherwise("biolink:related_to")
    val ancestors = Biolink.predicateAncestors.toSeq.toDF("predicate", "ancestors")
    Tables.events(s, dir)
      .select(concat(lit("USER:"), col("user_id")).as("subject"),
        predicateOf.as("predicate"),
        concat(lit("EVENT:"), col("event_type")).as("object"))
      .join(broadcast(ancestors), Seq("predicate"))
      .select(col("subject"), explode(col("ancestors")).as("expanded_predicate"), col("object"))
      .groupBy(col("expanded_predicate"))
      .agg(count(lit(1)).as("n_edges"), count_distinct(col("subject")).as("n_subjects"))
      .orderBy(col("expanded_predicate"))
  }

  private def sqlQuote(m: Map[String, Seq[String]]): String =
    m.map { case (k, vs) => s"('$k', [${vs.map("'" + _ + "'").mkString(",")}])" }.mkString(", ")

  private val q23Sql =
    s"""WITH anc(predicate, ancestors) AS (VALUES ${sqlQuote(Biolink.predicateAncestors)}),
        edges AS (
          SELECT 'USER:' || user_id AS subject,
                 CASE event_type
                   WHEN 'click' THEN 'biolink:directly_physically_interacts_with'
                   WHEN 'view' THEN 'biolink:physically_interacts_with'
                   WHEN 'purchase' THEN 'biolink:causes'
                   WHEN 'signup' THEN 'biolink:contributes_to'
                   ELSE 'biolink:related_to' END AS predicate,
                 'EVENT:' || event_type AS object
          FROM events)
        SELECT expanded_predicate, count(*) AS n_edges,
               count(DISTINCT subject) AS n_subjects
        FROM (SELECT subject, unnest(ancestors) AS expanded_predicate, object
              FROM edges JOIN anc USING (predicate))
        GROUP BY expanded_predicate ORDER BY expanded_predicate"""

  /** D2 — collapsed-qualifiers predicate grammar: build a synthetic predicate
    * string from qualifier columns in fixed grammar order
    * (ref orion/collapse_qualifiers.py:55-171). */
  private val q24: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(
        concat(lit("USER:"), col("user_id")).as("subject"),
        col("event_type"),
        when(col("value") >= 100, "increased").otherwise("decreased").as("object_direction_qualifier"),
        when(col("event_type").isin("click", "view"), "activity").otherwise("abundance").as("object_aspect_qualifier"))
      .withColumn("collapsed_predicate",
        concat(lit("biolink:affects_"),
               col("object_direction_qualifier"), lit("_"),
               col("object_aspect_qualifier"), lit("_of")))
      .groupBy(col("collapsed_predicate"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("collapsed_predicate"))
  }

  private val q24Sql =
    """SELECT 'biolink:affects_'
         || (CASE WHEN value >= 100 THEN 'increased' ELSE 'decreased' END)
         || '_'
         || (CASE WHEN event_type IN ('click','view') THEN 'activity' ELSE 'abundance' END)
         || '_of' AS collapsed_predicate,
       count(*) AS n
       FROM events GROUP BY 1 ORDER BY 1"""

  /** A11/D3 — meta-KG aggregation: (subject type, predicate, object type) →
    * counts + attribute set (ref orion/meta_kg.py:50-187). */
  private val q25: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    li.select(
        lit("biolink:Order").as("subject_type"),
        when(col("l_returnflag") === "R", "biolink:returned_part")
          .otherwise("biolink:contains_part").as("predicate"),
        lit("biolink:Part").as("object_type"),
        col("l_linestatus"))
      .groupBy(col("subject_type"), col("predicate"), col("object_type"))
      .agg(count(lit(1)).as("n_edges"),
           array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"))
      .orderBy(col("predicate"))
  }

  private val q25Sql =
    """SELECT 'biolink:Order' AS subject_type,
       CASE WHEN l_returnflag = 'R' THEN 'biolink:returned_part' ELSE 'biolink:contains_part' END AS predicate,
       'biolink:Part' AS object_type,
       count(*) AS n_edges,
       list_aggregate(list_sort(list_distinct(list(l_linestatus))), 'string_agg', ',') AS statuses
       FROM lineitem GROUP BY 1, 2, 3 ORDER BY predicate"""

  /** A13/D6 — QC source breakdown: per (source-set, primary source) distinct
    * counts (ref orion/kgx_validation.py:86-169). */
  private val q26: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(col("event_type").as("primary_source"), col("user_id"),
        when(col("value") >= 100, "infores:high").otherwise("infores:low").as("aggregator_set"))
      .groupBy(col("aggregator_set"), col("primary_source"))
      .agg(count(lit(1)).as("n_edges"), count_distinct(col("user_id")).as("n_distinct_users"))
      .orderBy(col("aggregator_set"), col("primary_source"))
  }

  private val q26Sql =
    """SELECT CASE WHEN value >= 100 THEN 'infores:high' ELSE 'infores:low' END AS aggregator_set,
       event_type AS primary_source,
       count(*) AS n_edges, count(DISTINCT user_id) AS n_distinct_users
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** A14/D4 — AnswerCoalesce links/backlinks: per node both directions with
    * symmetric-predicate handling (ref orion/answercoalesce_build.py:57-165). */
  private val q27: Q = (s, dir) => {
    val edges = Tables.lineitem(s, dir).select(
      concat(lit("SUPP:"), col("l_suppkey")).as("subject"),
      lit("supplies").as("predicate"),
      concat(lit("PART:"), col("l_partkey")).as("object"))
    val fwd = edges.select(col("subject").as("node"), col("predicate"), lit(true).as("is_source"), col("object").as("other"))
    val bwd = edges.select(col("object").as("node"), col("predicate"), lit(false).as("is_source"), col("subject").as("other"))
    fwd.unionByName(bwd)
      .groupBy(col("node"), col("predicate"), col("is_source"))
      .agg(count_distinct(col("other")).as("n_links"))
      .groupBy(col("is_source"))
      .agg(count(lit(1)).as("n_node_pred_pairs"), sum(col("n_links")).as("total_links"))
      .orderBy(col("is_source"))
  }

  private val q27Sql =
    """SELECT is_source, count(*) AS n_node_pred_pairs, CAST(sum(n_links) AS BIGINT) AS total_links FROM (
         SELECT node, predicate, is_source, count(DISTINCT other) AS n_links FROM (
           SELECT 'SUPP:' || l_suppkey AS node, 'supplies' AS predicate, true AS is_source, 'PART:' || l_partkey AS other FROM lineitem
           UNION ALL
           SELECT 'PART:' || l_partkey, 'supplies', false, 'SUPP:' || l_suppkey FROM lineitem)
         GROUP BY node, predicate, is_source)
       GROUP BY is_source ORDER BY is_source"""

  /** N6 + P9 + P8 — normalization cleanup trio: self-loop removal, name
    * fallback, whitespace flattening
    * (refs orion/kgx_file_normalizer.py:298-301, normalization.py:231-242). */
  private val q28: Q = (s, dir) => {
    Tables.part(s, dir)
      .select(
        concat(lit("N:"), col("p_partkey") % 50).as("subject"),
        lit(Biolink.SubclassOf).as("predicate"),
        concat(lit("N:"), col("p_size") % 50).as("object"),
        col("p_name"))
      .filter(!(col("subject") === col("object"))) // N6 self-loop removal
      .withColumn("name", coalesce(nullif(col("p_name"), lit("")),
        regexp_replace(col("subject"), "^.*:", ""))) // P9 fallback
      .withColumn("name", regexp_replace(col("name"), "[\\n\\r\\t]+", " ")) // P8
      .groupBy(col("object"))
      .agg(count(lit(1)).as("n_children"), min(col("name")).as("first_name"))
      .orderBy(col("object"))
  }

  private val q28Sql =
    """SELECT object, count(*) AS n_children, min(name) AS first_name FROM (
         SELECT 'N:' || (p_partkey % 50) AS subject,
                'N:' || (p_size % 50) AS object,
                regexp_replace(coalesce(nullif(p_name, ''),
                  regexp_replace('N:' || (p_partkey % 50), '^.*:', '')), '[\n\r\t]+', ' ', 'g') AS name
         FROM part
         WHERE 'N:' || (p_partkey % 50) <> 'N:' || (p_size % 50))
       GROUP BY object ORDER BY object"""

  /** N1-N8 via the real Normalizer module: suppliers live in nations; nation
    * curies normalize to regions (region 0 splits 1→2); 'contains' edges are
    * inverted to located_in. Exercises endpoint joins, split explode,
    * predicate broadcast join, inversion swap, default provenance, original
    * id retention — with a full SQL oracle. */
  private val q29: Q = (s, dir) => {
    import graft.normalize.Normalizer._
    val n = Tables.nation(s, dir)
    val sup = Tables.supplier(s, dir)
    val identity = sup.select(
      concat(lit("SUPP:"), col("s_suppkey")).as("orig_id"),
      concat(lit("SUPP:"), col("s_suppkey")).as("norm_id"))
    val nationMap = n.select(col("n_nationkey"), col("n_regionkey"))
      .select(concat(lit("NATION:"), col("n_nationkey")).as("orig_id"),
        explode(when(col("n_regionkey") === 0,
          array(concat(lit("REGION:"), col("n_regionkey")),
                concat(lit("RSPLIT:"), col("n_regionkey"))))
          .otherwise(array(concat(lit("REGION:"), col("n_regionkey"))))).as("norm_id"))
    val nodeMap = identity.unionByName(nationMap)
      .withColumn("name", lit(null).cast("string"))
      .withColumn("category", array(lit("biolink:NamedThing")))
      .withColumn("equivalent_identifiers", array().cast("array<string>"))
      .withColumn("information_content", lit(null).cast("double"))
    val predMap = predicateMapDf(s, Seq(
      PredicateNormEntry("located_in", "biolink:located_in"),
      PredicateNormEntry("contains", "biolink:located_in", inverted = true)))
    val edges = sup.select(
      when(col("s_suppkey") % 2 === 0, concat(lit("SUPP:"), col("s_suppkey")))
        .otherwise(concat(lit("NATION:"), col("s_nationkey"))).as(Biolink.Subject),
      when(col("s_suppkey") % 2 === 0, lit("located_in")).otherwise(lit("contains")).as(Biolink.Predicate),
      when(col("s_suppkey") % 2 === 0, concat(lit("NATION:"), col("s_nationkey")))
        .otherwise(concat(lit("SUPP:"), col("s_suppkey"))).as(Biolink.Object_))
    val (out, _) = normalizeEdges(edges, nodeMap, predMap, "infores:synth",
      computeStats = false)
    out.select(col("subject"), col("predicate"), col("object"),
        col("original_subject"), col("original_object"), col("primary_knowledge_source"))
      .orderBy(col("subject"), col("object"), col("original_subject"))
  }

  private val q29Sql =
    """WITH nation_norm AS (
         SELECT 'NATION:' || n_nationkey AS orig,
                unnest(CASE WHEN n_regionkey = 0
                       THEN ['REGION:' || n_regionkey, 'RSPLIT:' || n_regionkey]
                       ELSE ['REGION:' || n_regionkey] END) AS norm
         FROM nation),
       edges AS (
         SELECT CASE WHEN s_suppkey % 2 = 0 THEN 'SUPP:' || s_suppkey ELSE 'NATION:' || s_nationkey END AS subject,
                CASE WHEN s_suppkey % 2 = 0 THEN 'located_in' ELSE 'contains' END AS predicate,
                CASE WHEN s_suppkey % 2 = 0 THEN 'NATION:' || s_nationkey ELSE 'SUPP:' || s_suppkey END AS object,
                s_suppkey % 2 <> 0 AS inverted
         FROM supplier),
       normed AS (
         SELECT CASE WHEN subject LIKE 'NATION:%' THEN nn1.norm ELSE subject END AS subj_norm,
                CASE WHEN object LIKE 'NATION:%' THEN nn2.norm ELSE object END AS obj_norm,
                subject AS orig_subj, object AS orig_obj, inverted
         FROM edges
         LEFT JOIN nation_norm nn1 ON subject = nn1.orig
         LEFT JOIN nation_norm nn2 ON object = nn2.orig
         WHERE (subject NOT LIKE 'NATION:%' OR nn1.norm IS NOT NULL)
           AND (object NOT LIKE 'NATION:%' OR nn2.norm IS NOT NULL))
       SELECT CASE WHEN inverted THEN obj_norm ELSE subj_norm END AS subject,
              'biolink:located_in' AS predicate,
              CASE WHEN inverted THEN subj_norm ELSE obj_norm END AS object,
              CASE WHEN inverted THEN orig_obj ELSE orig_subj END AS original_subject,
              CASE WHEN inverted THEN orig_subj ELSE orig_obj END AS original_object,
              'infores:synth' AS primary_knowledge_source
       FROM normed
       ORDER BY subject, object, original_subject"""

  /** J4 — connected_edge_subset through the real GraphMerger: secondary
    * edges kept when EITHER endpoint is in the primary id set, missing
    * endpoints backfilled from the secondary's nodes
    * (ref orion/kgx_file_merger.py:127-162). Output = kept edges + the
    * backfill node ids, tagged so one result covers both halves. */
  private val q47: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val edges = li.select(
      concat(lit("SUPP:"), col("l_suppkey")).as("subject"),
      lit("supplies").as("predicate"),
      concat(lit("PART:"), col("l_partkey")).as("object"))
    val secNodes = edges.select(col("subject").as("id"))
      .union(edges.select(col("object"))).distinct()
    val prim = Tables.supplier(s, dir).filter(col("s_nationkey") < 5)
      .select(concat(lit("SUPP:"), col("s_suppkey")).as("id"))
    val (addNodes, kept) = GraphMerger.connectedEdgeSubset(prim,
      GraphMerger.SourceGraph("sec", secNodes, edges))
    kept.select(lit("edge").as("kind"), col("subject").as("a"), col("object").as("b"))
      .unionByName(addNodes.select(lit("backfill").as("kind"), col("id").as("a"),
        lit(null).cast("string").as("b")))
  }

  private val q47Sql =
    """WITH prim AS (SELECT 'SUPP:' || s_suppkey AS id FROM supplier WHERE s_nationkey < 5),
       sec AS (SELECT 'SUPP:' || l_suppkey AS subject, 'PART:' || l_partkey AS object FROM lineitem),
       kept AS (SELECT subject, object FROM sec
                WHERE subject IN (SELECT id FROM prim) OR object IN (SELECT id FROM prim)),
       endpoints AS (SELECT DISTINCT subject AS id FROM kept
                     UNION SELECT DISTINCT object FROM kept),
       backfill AS (SELECT id FROM endpoints WHERE id NOT IN (SELECT id FROM prim))
       SELECT kind, a, b FROM (
         SELECT 'edge' AS kind, subject AS a, object AS b FROM kept
         UNION ALL
         SELECT 'backfill', id, NULL FROM backfill)
       ORDER BY kind, a, b"""

  /** A8 — dont_merge through the real GraphMerger.mergeGraph: the
    * dont_merge source's nodes go through the ordinal-ordered property
    * merge (overlapping ids keep the primary's name — first truthy wins),
    * its edges append VERBATIM, duplicates included
    * (ref orion/kgx_file_merger.py:164-172). */
  private val q48: Q = (s, dir) => {
    val cust = Tables.customer(s, dir)
    val primNodes = cust.select(concat(lit("CUST:"), col("c_custkey")).as("id"),
      col("c_name").as("name"))
    val orders = Tables.orders(s, dir)
    val primEdges = orders.select(
      concat(lit("CUST:"), col("o_custkey")).as("subject"),
      lit("placed").as("predicate"),
      concat(lit("ORDER:"), col("o_orderkey")).as("object"),
      lit("infores:prim").as("primary_knowledge_source"))
    // overlapping ids whose name must LOSE, new EXTRA ids that must appear,
    // and a verbatim-append edge slice that duplicates primary edge keys
    val dmNodes = cust.filter(col("c_custkey") % 2 === 0)
      .select(concat(lit("CUST:"), col("c_custkey")).as("id"),
        lit("dm-should-lose").as("name"))
      .union(cust.filter(col("c_custkey") % 1000 === 0)
        .select(concat(lit("EXTRA:"), col("c_custkey")), lit("dm-extra")))
    val dmEdges = orders.filter(col("o_orderkey") % 50 === 0).select(
      concat(lit("CUST:"), col("o_custkey")).as("subject"),
      lit("placed").as("predicate"),
      concat(lit("ORDER:"), col("o_orderkey")).as("object"),
      lit("infores:dm").as("primary_knowledge_source"))
    val merged = GraphMerger.mergeGraph(
      primary = Seq(GraphMerger.SourceGraph("prim", primNodes, primEdges)),
      dontMerge = Seq(GraphMerger.SourceGraph("dm", dmNodes, dmEdges)))
    // a query has no post-consumption hook: drop the merge caches now so
    // repeated invocations (Verify, specs) don't accumulate pinned blocks;
    // downstream consumption recomputes the (fixture-sized) merge lazily
    merged.release()
    merged.nodes.select(lit("node").as("kind"), col("id").as("a"), col("name").as("b"))
      .unionByName(merged.edges.select(lit("edge").as("kind"),
        concat_ws("|", col("subject"), col("object")).as("a"),
        col("primary_knowledge_source").as("b")))
  }

  private val q48Sql =
    """WITH prim_nodes AS (SELECT 'CUST:' || c_custkey AS id, c_name AS name FROM customer),
       dm_nodes AS (
         SELECT 'CUST:' || c_custkey AS id, 'dm-should-lose' AS name
         FROM customer WHERE c_custkey % 2 = 0
         UNION ALL
         SELECT 'EXTRA:' || c_custkey, 'dm-extra' FROM customer WHERE c_custkey % 1000 = 0),
       nodes AS (
         SELECT id, name FROM prim_nodes
         UNION ALL
         SELECT id, name FROM dm_nodes WHERE id NOT IN (SELECT id FROM prim_nodes)),
       edges AS (
         SELECT 'CUST:' || o_custkey || '|' || 'ORDER:' || o_orderkey AS a,
                'infores:prim' AS b FROM orders
         UNION ALL
         SELECT 'CUST:' || o_custkey || '|' || 'ORDER:' || o_orderkey,
                'infores:dm' FROM orders WHERE o_orderkey % 50 = 0)
       SELECT kind, a, b FROM (
         SELECT 'node' AS kind, id AS a, name AS b FROM nodes
         UNION ALL
         SELECT 'edge', a, b FROM edges)
       ORDER BY kind, a, b"""

  val defs: Map[String, Q] = Map(
    "q20_kgx_node_merge"        -> q20,
    "q47_connected_edge_subset" -> q47,
    "q48_dont_merge"            -> q48,
    "q21_edge_merge_key"        -> q21,
    "q22_norm_split_join"       -> q22,
    "q23_redundant_expansion"   -> q23,
    "q24_collapsed_qualifiers"  -> q24,
    "q25_meta_kg_agg"           -> q25,
    "q26_qc_breakdown"          -> q26,
    "q27_ac_links"              -> q27,
    "q28_norm_cleanup"          -> q28,
    "q29_normalize_edges"       -> q29,
  )

  val oracles: Map[String, String] = Map(
    "q29_normalize_edges"       -> q29Sql,
    "q20_kgx_node_merge"        -> q20Sql,
    "q47_connected_edge_subset" -> q47Sql,
    "q48_dont_merge"            -> q48Sql,
    "q21_edge_merge_key"        -> q21Sql,
    "q22_norm_split_join"       -> q22Sql,
    "q23_redundant_expansion"   -> q23Sql,
    "q24_collapsed_qualifiers"  -> q24Sql,
    "q25_meta_kg_agg"           -> q25Sql,
    "q26_qc_breakdown"          -> q26Sql,
    "q27_ac_links"              -> q27Sql,
    "q28_norm_cleanup"          -> q28Sql,
  )
}
