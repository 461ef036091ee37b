package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core of the operator inventory (SURVEY.md §2.3–§2.6) expressed
  * over the synthetic star schema, each with a DuckDB oracle.
  *
  * Scale notes (the queries run unchanged on a 1000-executor cluster):
  *  - dimension tables (region/nation/customer/part/supplier) are broadcast —
  *    no shuffle on the fact side of those joins;
  *  - every aggregate is a partial (map-side combine) hash aggregate;
  *  - doubles that cross the oracle boundary are rounded in BOTH engines so
  *    summation-order ulp noise can't flip the hash.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** A1/A10 — pricing summary (TPC-H Q1 shape): filter → partial agg → final.
    * Ref: merge counters orion/kgx_file_writer.py:27-30. */
  private val q01: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") < lit("1996-06-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-06-01'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  /** J1/J7 — multi-way equi-join (TPC-H Q5 shape): two broadcast dims +
    * fact-fact shuffle join, revenue per region. */
  private val q02: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val o  = Tables.orders(s, dir)
    val c  = Tables.customer(s, dir)
    val n  = Tables.nation(s, dir)
    val r  = Tables.region(s, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"))
  }

  private val q02Sql =
    """SELECT r_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name"""

  /** J3/P4 — broadcast dimension lookup + string projection: revenue per
    * leading word of p_type (predicate-remap shape,
    * ref orion/predicates.py:6-56). */
  private val q03: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val p  = Tables.part(s, dir)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .withColumn("type_class", split(col("p_type"), " ").getItem(0))
      .groupBy(col("type_class"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
           count(lit(1)).as("n"))
      .orderBy(col("type_class"))
  }

  private val q03Sql =
    """SELECT split_part(p_type, ' ', 1) AS type_class,
       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY 1 ORDER BY 1"""

  /** J4/J5 — left-semi join (connected-node subset shape,
    * ref orion/kgx_file_normalizer.py:419-439). */
  private val q04: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val q04Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       ORDER BY c_custkey"""

  /** U3 — left-anti join (unconnected-node removal complement,
    * ref orion/kgx_file_normalizer.py:419-439): customers with no urgent
    * order, counted per segment. */
  private val q05: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_unconnected"))
      .orderBy(col("c_mktsegment"))
  }

  private val q05Sql =
    """SELECT c_mktsegment, count(*) AS n_unconnected FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderpriority = '1-URGENT')
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** K1/J8 — exact dedup with deterministic canonical pick (dedup-on-write,
    * ref orion/kgx_file_writer.py:64-69): group by content hash, min id wins. */
  private val q06: Q = (s, dir) => {
    Tables.documents(s, dir)
      .withColumn("content_key", md5(lower(col("text"))))
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= 1)
      .orderBy(col("canonical_id"))
  }

  private val q06Sql =
    """SELECT md5(lower(text)) AS content_key,
       min(doc_id) AS canonical_id, count(*) AS n_copies
       FROM documents GROUP BY 1 HAVING count(*) >= 1 ORDER BY canonical_id"""

  /** U1/A8 — union of heterogeneous sources then aggregate
    * (dont_merge append shape, ref orion/kgx_file_merger.py:164-172). */
  private val q07: Q = (s, dir) => {
    val r = Tables.region(s, dir).select(lit("region").as("src"), col("r_name").as("name"))
    val n = Tables.nation(s, dir).select(lit("nation").as("src"), col("n_name").as("name"))
    r.unionByName(n)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), min(col("name")).as("first_name"))
      .orderBy(col("src"))
  }

  private val q07Sql =
    """SELECT src, count(*) AS n, min(name) AS first_name FROM (
         SELECT 'region' AS src, r_name AS name FROM region
         UNION ALL
         SELECT 'nation' AS src, n_name AS name FROM nation)
       GROUP BY src ORDER BY src"""

  /** P1 — multi-predicate fan-out via explode of an inline struct array
    * (extractor fan-out, ref orion/extractor.py:113-147). */
  private val q08: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(explode(array(
        struct(lit("status").as("kind"), col("o_orderstatus").as("value")),
        struct(lit("priority").as("kind"), col("o_orderpriority").as("value")))).as("kv"))
      .select(col("kv.kind").as("kind"), col("kv.value").as("value"))
      .groupBy(col("kind"), col("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("kind"), col("value"))
  }

  private val q08Sql =
    """SELECT kind, value, count(*) AS n FROM (
         SELECT 'status' AS kind, o_orderstatus AS value FROM orders
         UNION ALL
         SELECT 'priority' AS kind, o_orderpriority AS value FROM orders)
       GROUP BY kind, value ORDER BY kind, value"""

  /** P3 — id-set membership filter through the real Extractor.filterBySet,
    * deliberately sized ABOVE the broadcast-isin cutoff so the oracled path
    * is the scale one: a left-semi join against the distributed set (ref
    * orion/extractor.py:51-54). */
  private val q49: Q = (s, dir) => {
    val ids = (1 until 40000 by 2).map(_.toString).toSet // 20k > the 10k isin cutoff
    graft.extract.Extractor.filterBySet(
        Tables.part(s, dir), col("p_partkey").cast("string"), ids)
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
  }

  private val q49Sql =
    """SELECT p_brand, count(*) AS n FROM part
       WHERE p_partkey % 2 = 1 AND p_partkey BETWEEN 1 AND 39999
       GROUP BY p_brand ORDER BY p_brand"""

  /** Window top-k per group (scale op beyond the reference; the shuffle is
    * one hash partition by c_custkey, no global sort). */
  private val q09: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  private val q09Sql =
    """SELECT o_custkey, o_orderkey, rk, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
         FROM orders) WHERE rk <= 3
       ORDER BY o_custkey, rk"""

  /** A9 — grouped evidence vote (CTD chem→disease predicate vote shape,
    * ref parsers/CTD/src/loadCTD.py:304-471,547-587): count evidence classes
    * per key, ratio ladder picks a label, union the evidence list. */
  private val q10: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
        array_join(array_sort(collect_set(col("event_type"))), ",").as("evidence_types"))
      .withColumn("verdict",
        when(col("n_click") > col("n_error") * 2, "clicky")
          .when(col("n_error") > col("n_click") * 2, "errory")
          .otherwise("mixed"))
      .select(col("user_id"), col("n_click"), col("n_error"), col("verdict"), col("evidence_types"))
      .orderBy(col("user_id"))
  }

  private val q10Sql =
    """SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               > sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 2 THEN 'clicky'
            WHEN sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               > sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 2 THEN 'errory'
            ELSE 'mixed' END AS verdict,
       list_aggregate(list_sort(list_distinct(list(event_type))), 'string_agg', ',') AS evidence_types
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** Time-bucketed aggregation (batch twin of the Structured Streaming
    * windowed agg in graft.streaming). */
  private val q11: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  private val q11Sql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** N5/P7 — conditional edge inversion: swap subject/object when the
    * predicate was inverted (ref orion/kgx_file_normalizer.py:404-413). */
  private val q12: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .select(
        when(col("l_returnflag") === "R", concat(lit("SUPP:"), col("l_suppkey")))
          .otherwise(concat(lit("PART:"), col("l_partkey"))).as("subject"),
        when(col("l_returnflag") === "R", lit("supplied_returned"))
          .otherwise(lit("ships_part")).as("predicate"),
        when(col("l_returnflag") === "R", concat(lit("PART:"), col("l_partkey")))
          .otherwise(concat(lit("SUPP:"), col("l_suppkey"))).as("object"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q12Sql =
    """SELECT
       CASE WHEN l_returnflag = 'R' THEN 'SUPP:' || l_suppkey ELSE 'PART:' || l_partkey END AS subject,
       CASE WHEN l_returnflag = 'R' THEN 'supplied_returned' ELSE 'ships_part' END AS predicate,
       CASE WHEN l_returnflag = 'R' THEN 'PART:' || l_partkey ELSE 'SUPP:' || l_suppkey END AS object,
       l_orderkey, l_linenumber
       FROM lineitem ORDER BY l_orderkey, l_linenumber"""

  /** S5 — JSON-bag scan: parse the events.props JSON string column
    * (the JSON-array/extractor-callback scan shape,
    * ref orion/extractor.py:84-101). */
  private val q13: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  private val q13Sql =
    """SELECT event_type, count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
       FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
       GROUP BY event_type ORDER BY event_type"""

  /** Batch sessionization twin (graft.streaming.EventStreams.sessionizeBatch):
    * 30-minute gap sessions per user via lag/window. */
  private val q14: Q = (s, dir) => {
    graft.streaming.EventStreams.sessionizeBatch(Tables.events(s, dir), gapMs = 30 * 60 * 1000L)
      .select(col("user_id"), col("n_events"), col("total_value"),
        unix_millis(col("started")).as("started_ms"),
        unix_millis(col("ended")).as("ended_ms"))
      .orderBy(col("user_id"), col("started_ms"))
  }

  private val q14Sql =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
              epoch_ms(min(ts)) AS started_ms, epoch_ms(max(ts)) AS ended_ms
       FROM (
         SELECT user_id, ts, value,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         FROM (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000
                       THEN 1 ELSE 0 END AS new_session
           FROM events))
       GROUP BY user_id, session_no ORDER BY user_id, started_ms"""

  /** A6 — pre-merge edge-id mapping via the real MergeEngine: duplicate
    * (order, part) edges list their pre-merge line ids
    * (ref orion/merging.py:280-295). */
  private val q15: Q = (s, dir) => {
    val edges = Tables.lineitem(s, dir).select(
      concat(lit("ORDER:"), col("l_orderkey")).as("subject"),
      lit("contains_part").as("predicate"),
      concat(lit("PART:"), col("l_partkey")).as("object"),
      lit("infores:synth").as("primary_knowledge_source"),
      concat(lit("L"), col("l_orderkey"), lit("-"), col("l_linenumber")).as("id"))
    // no orderBy: the correctness harness sorts rows before hashing, so a
    // final range shuffle + sampling job would be pure overhead
    graft.merge.MergeEngine.edgeIdMapping(edges)
      .select(array_join(col("pre_merge_ids"), ",").as("pre_merge_ids"),
        size(col("pre_merge_ids")).as("n"))
  }

  private val q15Sql =
    """SELECT list_aggregate(list_sort(list('L' || l_orderkey || '-' || l_linenumber)), 'string_agg', ',') AS pre_merge_ids,
              count(*) AS n
       FROM lineitem GROUP BY l_orderkey, l_partkey HAVING count(*) > 1
       ORDER BY pre_merge_ids"""

  /** Rollup (multi-level aggregate; beyond the reference — A12's two-level
    * summaries generalized): priority × status with subtotals. */
  private val q16: Q = (s, dir) => {
    Tables.orders(s, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy(col("priority"), col("status"))
  }

  private val q16Sql =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
              coalesce(o_orderstatus, 'ALL') AS status,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
       ORDER BY priority, status"""

  /** Pivot (wide aggregation; beyond the reference — the schema-summary
    * shape A12 turned sideways): events per user-decade × type. */
  private val q17: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("user_decade", (col("user_id") / 10).cast("long"))
      .groupBy(col("user_decade"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0)
      .orderBy(col("user_decade"))
  }

  private val q17Sql =
    """SELECT user_id // 10 AS user_decade,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
              CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
              CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
       FROM events GROUP BY 1 ORDER BY 1"""

  /** q82 — CUBE (full grouping-set lattice; q16 covers the ROLLUP prefix
    * chain): events by type × hour with the grouping mask derived from
    * key null-ness (both grouping keys are non-null in the data, so the
    * mask is unambiguous and engine-neutral — no grouping_id() dialect
    * dependence). Partial hash aggregates feed every lattice level;
    * Catalyst expands to a single Expand + Aggregate, one shuffle. */
  private val q82: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("hr", hour(col("ts")).cast("long"))
      .cube(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("hr"), lit(-1L)).as("hr"),
        (col("event_type").isNull.cast("int") * 2 +
          col("hr").isNull.cast("int")).as("g"),
        col("n"), col("sum_v"))
      .orderBy(col("g"), col("event_type"), col("hr"))
  }

  private val q82Sql =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
              coalesce(hr, -1) AS hr,
              (CASE WHEN event_type IS NULL THEN 2 ELSE 0 END
               + CASE WHEN hr IS NULL THEN 1 ELSE 0 END) AS g,
              count(*) AS n, round(sum(value), 2) AS sum_v
       FROM (SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hr, value
             FROM events)
       GROUP BY CUBE(event_type, hr)
       ORDER BY g, event_type, hr"""

  /** q83 — grouped z-score normalization (feature standardization, the
    * per-stratum scaling step of a feature pipeline): order totals
    * standardized within the customer's market segment. Group stats come
    * from ONE partial-aggregate pass and broadcast back — no WindowExec
    * (a per-segment window would sort each segment on one executor; the
    * broadcast join keeps the fact side pipelined and shuffle-free after
    * the orders⋈customer equi-join). */
  private val q83: Q = (s, dir) => {
    val oc = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))
    val stats = oc.groupBy(col("c_mktsegment"))
      .agg(avg(col("o_totalprice")).as("mu"),
        stddev_samp(col("o_totalprice")).as("sigma"))
    oc.join(broadcast(stats), Seq("c_mktsegment"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        round((col("o_totalprice") - col("mu")) / col("sigma"), 6).as("z"))
  }

  private val q83Sql =
    """WITH oc AS (SELECT o_orderkey, c_mktsegment, o_totalprice
                   FROM orders JOIN customer ON o_custkey = c_custkey),
            st AS (SELECT c_mktsegment, avg(o_totalprice) AS mu,
                          stddev_samp(o_totalprice) AS sigma
                   FROM oc GROUP BY c_mktsegment)
       SELECT o_orderkey, c_mktsegment,
              round((o_totalprice - mu) / sigma, 6) AS z
       FROM oc JOIN st USING (c_mktsegment)"""

  /** q86 — SCD type-2 history (MERGE INTO's batch twin): the orders
    * snapshot plus two synthetic change feeds (every 7th order re-priced
    * at +30 days; every 14th order re-sent UNCHANGED at +60 days — the
    * no-op echo the compaction must drop). Exact-input derived price →
    * tie-stable rounding. See [[graft.operators.Scd2]]. */
  private val q86: Q = (s, dir) => {
    import graft.functions.StableRound.tieStableRound
    val o = Tables.orders(s, dir)
    val base = o.select(col("o_orderkey"), col("o_orderdate").as("eff_ts"),
      col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
    def feed(mod: Int, days: Int) = o.filter(col("o_orderkey") % mod === 0)
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr(s"INTERVAL $days DAYS")).as("eff_ts"),
        lit("X").as("status"),
        tieStableRound(col("o_totalprice") * 1.1, 2).as("price"))
    graft.operators.Scd2.history(
        base.unionByName(feed(7, 30)).unionByName(feed(14, 60)),
        "o_orderkey", "eff_ts", Seq("status", "price"))
      .select(col("o_orderkey"), col("status"), col("price"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  private val q86Sql = {
    val priced = graft.functions.StableRound.sql("o_totalprice * 1.1", 2)
    s"""WITH base AS (SELECT o_orderkey, o_orderdate AS eff_ts,
                             o_orderstatus AS status, o_totalprice AS price
                      FROM orders),
            u1 AS (SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY,
                          'X', $priced FROM orders WHERE o_orderkey % 7 = 0),
            u2 AS (SELECT o_orderkey, o_orderdate + INTERVAL 60 DAY,
                          'X', $priced FROM orders WHERE o_orderkey % 14 = 0),
            r AS (SELECT * FROM base UNION ALL SELECT * FROM u1
                  UNION ALL SELECT * FROM u2),
            g AS (SELECT r.*, row_number() OVER w AS rn,
                         lag(status) OVER w AS ps, lag(price) OVER w AS pp
                  FROM r WINDOW w AS (PARTITION BY o_orderkey ORDER BY eff_ts)),
            chg AS (SELECT * FROM g
                    WHERE rn = 1 OR ps IS DISTINCT FROM status
                                 OR pp IS DISTINCT FROM price),
            v AS (SELECT o_orderkey, status, price, eff_ts AS valid_from,
                         lead(eff_ts) OVER (PARTITION BY o_orderkey
                                            ORDER BY eff_ts) AS valid_to
                  FROM chg)
       SELECT o_orderkey, status, price, valid_from, valid_to,
              valid_to IS NULL AS is_current
       FROM v"""
  }

  /** q87 — conversion funnel: first view → first click at-or-after it →
    * first purchase at-or-after that, per user. Three partial-aggregate
    * passes chained by broadcast-size joins (the per-user stage tables
    * shrink monotonically); `stage` counts completed steps. */
  private val q87: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        (lit(1) + col("t_click").isNotNull.cast("int")
          + col("t_purchase").isNotNull.cast("int")).as("stage"))
  }

  private val q87Sql =
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t_click
                  FROM events e JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click' AND e.ts >= v.t_view
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t_purchase
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
                  GROUP BY e.user_id)
       SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
              (1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
                 + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS stage
       FROM v LEFT JOIN c ON v.user_id = c.user_id
              LEFT JOIN p ON v.user_id = p.user_id"""

  /** q88 — cohort retention: users bucketed by first-seen week, activity
    * counted per (cohort, weeks-since) cell. Both week truncations are
    * Monday-start in both engines; the offset division is exact (both
    * ends are week-truncated instants). */
  private val q88: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val cohort = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    active.join(cohort, Seq("user_id"))
      .select(col("cohort"),
        ((unix_micros(col("wk")) - unix_micros(col("cohort")))
          / lit(604800000000L)).cast("long").as("week_no"))
      .groupBy(col("cohort"), col("week_no"))
      .agg(count(lit(1)).as("n_users"))
  }

  private val q88Sql =
    """WITH cohort AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                       FROM events GROUP BY user_id),
            active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                       FROM events)
       SELECT c.cohort,
              (epoch_us(a.wk) - epoch_us(c.cohort)) // 604800000000 AS week_no,
              count(*) AS n_users
       FROM active a JOIN cohort c ON a.user_id = c.user_id
       GROUP BY 1, 2"""

  val defs: Map[String, Q] = Map(
    "q17_pivot"                  -> q17,
    "q01_pricing_summary"        -> q01,
    "q02_region_revenue"         -> q02,
    "q03_broadcast_type_share"   -> q03,
    "q04_semi_join_connected"    -> q04,
    "q05_anti_join_unconnected"  -> q05,
    "q06_dedup_exact"            -> q06,
    "q07_union_sources"          -> q07,
    "q08_fanout_explode"         -> q08,
    "q49_id_set_filter"          -> q49,
    "q09_topk_per_group"         -> q09,
    "q10_grouped_evidence_vote"  -> q10,
    "q11_hourly_rollup"          -> q11,
    "q12_edge_inversion"         -> q12,
    "q13_json_props_scan"        -> q13,
    "q14_sessionize"             -> q14,
    "q15_edge_id_mapping"        -> q15,
    "q16_rollup"                 -> q16,
    "q82_cube"                   -> q82,
    "q83_zscore"                 -> q83,
    "q86_scd2_history"           -> q86,
    "q87_funnel"                 -> q87,
    "q88_cohort_retention"       -> q88,
  )

  val oracles: Map[String, String] = Map(
    "q17_pivot"                  -> q17Sql,
    "q13_json_props_scan"        -> q13Sql,
    "q14_sessionize"             -> q14Sql,
    "q15_edge_id_mapping"        -> q15Sql,
    "q16_rollup"                 -> q16Sql,
    "q01_pricing_summary"        -> q01Sql,
    "q02_region_revenue"         -> q02Sql,
    "q03_broadcast_type_share"   -> q03Sql,
    "q04_semi_join_connected"    -> q04Sql,
    "q05_anti_join_unconnected"  -> q05Sql,
    "q06_dedup_exact"            -> q06Sql,
    "q07_union_sources"          -> q07Sql,
    "q08_fanout_explode"         -> q08Sql,
    "q49_id_set_filter"          -> q49Sql,
    "q09_topk_per_group"         -> q09Sql,
    "q10_grouped_evidence_vote"  -> q10Sql,
    "q11_hourly_rollup"          -> q11Sql,
    "q12_edge_inversion"         -> q12Sql,
    "q82_cube"                   -> q82Sql,
    "q83_zscore"                 -> q83Sql,
    "q86_scd2_history"           -> q86Sql,
    "q87_funnel"                 -> q87Sql,
    "q88_cohort_retention"       -> q88Sql,
  )
}
