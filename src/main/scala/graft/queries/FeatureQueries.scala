package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.StableRound

/** Warehouse / feature-store operators: CDC change-log application
  * (the lakehouse MERGE shape), multi-touch attribution, time-weighted
  * averages over irregular samples, and market-concentration (HHI)
  * rollups. All exact-arithmetic, all oracled against literal SQL
  * formulations in DuckDB.
  */
object FeatureQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q137 — CDC change-log application: the events stream re-read as an
    * upsert/delete log per (user, event_type) key — 'error' rows are
    * deletes, everything else upserts value — collapsed to final table
    * state by ONE struct-max aggregation per key (latest (ts, event_id)
    * wins; no per-key window over the whole log). The lakehouse MERGE
    * INTO shape without the engine dependency: at 100 TB the log is the
    * only shuffled input, keys never rescan history. */
  private val q137: Q = (s, dir) => {
    val log = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        col("ts"), col("event_id"), col("value"),
        (col("event_type") === "error").as("is_delete"))
    log.groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts"), col("event_id"),
        col("is_delete"), col("value"))).as("last"))
      .filter(!col("last.is_delete"))
      .select(col("user_id"), col("event_type"),
        col("last.event_id").as("last_event_id"),
        coalesce(col("last.value"), lit(-1.0)).as("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  private val q137Sql =
    """SELECT user_id, event_type, last_event_id, value FROM (
         SELECT user_id, event_type, event_id AS last_event_id,
                coalesce(value, -1.0) AS value,
                event_type = 'error' AS is_delete,
                row_number() OVER (PARTITION BY user_id, event_type
                  ORDER BY ts DESC, event_id DESC) AS rn
         FROM events)
       WHERE rn = 1 AND NOT is_delete
       ORDER BY user_id, event_type"""

  /** q138 — multi-touch attribution: for every purchase, the FIRST and
    * LAST click by the same user in the preceding 7 days plus the touch
    * count — assigning conversion credit, where the funnel/cohort ops
    * only aggregate. One bounded range join (the q72 machinery shape)
    * feeds min/max/count struct aggregation per conversion. */
  private val q138: Q = (s, dir) => {
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
    val touches = graft.operators.RangeJoin.pairsPreceding(
      purchases, clicks, keys = Seq("user_id"), leftTs = "ts", rightTs = "cts",
      spanMicros = 7L * 24 * 3600 * 1000000L, rightPayload = Seq("click_id"))
    val credited = touches.groupBy(col("event_id"))
      .agg(min(struct(col("matched_ts"), col("click_id"))).as("first"),
        max(struct(col("matched_ts"), col("click_id"))).as("last"),
        count(lit(1)).as("n_touches"))
    purchases.join(credited, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"),
        col("first.click_id").as("first_click"),
        col("last.click_id").as("last_click"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"))
      .orderBy(col("event_id"))
  }

  private val q138Sql =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts AS cts, event_id AS click_id
                  FROM events WHERE event_type = 'click'),
            t AS (SELECT p.event_id, c.cts, c.click_id
                  FROM p JOIN c ON p.user_id = c.user_id
                   AND c.cts > p.ts - INTERVAL 7 DAY AND c.cts <= p.ts),
            ranked AS (SELECT event_id, click_id,
                              row_number() OVER (PARTITION BY event_id
                                ORDER BY cts ASC, click_id ASC) AS rf,
                              row_number() OVER (PARTITION BY event_id
                                ORDER BY cts DESC, click_id DESC) AS rl
                       FROM t),
            agg AS (SELECT event_id,
                           max(CASE WHEN rf = 1 THEN click_id END) AS first_click,
                           max(CASE WHEN rl = 1 THEN click_id END) AS last_click,
                           CAST(count(*) AS BIGINT) AS n_touches
                    FROM ranked GROUP BY event_id)
       SELECT p.event_id, p.user_id, agg.first_click, agg.last_click,
              coalesce(agg.n_touches, 0) AS n_touches
       FROM p LEFT JOIN agg ON p.event_id = agg.event_id
       ORDER BY p.event_id"""

  /** q139 — time-weighted average (TWAP) per user: each observation
    * holds until the next one (LOCF weighting), so the mean is
    * Σ(valueᵢ·holdᵢ)/Σholdᵢ over the user's observation span — the
    * feature-store aggregate for irregularly sampled signals, where a
    * plain avg() overweights bursts. Exact arithmetic: cents × whole
    * seconds products summed as longs (≤3e15 at sf0.1), one division.
    * The last observation of each user carries no hold (span-bounded
    * integral); single-observation users yield null. */
  private val q139: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val held = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("_next_us", lead(unix_micros(col("ts")), 1).over(w))
      // integer `div`: Spark's `/` on longs is double division
      .withColumn("hold_s", expr("(_next_us - unix_micros(ts)) div 1000000"))
      .filter(col("hold_s").isNotNull)
    held.groupBy(col("user_id"))
      .agg(sum(col("cents") * col("hold_s")).as("wsum"),
        sum(col("hold_s")).as("span_s"))
      .select(col("user_id"), col("span_s"),
        StableRound.tieStableRound(
          col("wsum").cast("double") /
            when(col("span_s") === 0, null).otherwise(col("span_s")).cast("double") / 100.0,
          6).as("twap"))
      .orderBy(col("user_id"))
  }

  private val q139Sql = {
    val twap = "CAST(wsum AS DOUBLE) / CAST(nullif(span_s, 0) AS DOUBLE) / 100.0"
    s"""WITH held AS (
         SELECT user_id,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                CAST((lead(epoch_us(ts), 1) OVER w - epoch_us(ts)) // 1000000 AS BIGINT) AS hold_s
         FROM events WHERE value IS NOT NULL
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
       agg AS (SELECT user_id, CAST(sum(cents * hold_s) AS BIGINT) AS wsum,
                      CAST(sum(hold_s) AS BIGINT) AS span_s
               FROM held WHERE hold_s IS NOT NULL GROUP BY user_id)
       SELECT user_id, span_s, ${StableRound.sql(twap, 6)} AS twap
       FROM agg ORDER BY user_id"""
  }

  /** q140 — market-concentration rollup: Herfindahl-Hirschman index of
    * supplier revenue within each region — HHI = Σ shareᵢ² = Σsᵢ²/S²,
    * computed as ONE division of exact integer sums. Per-supplier
    * revenue aggregates in exact CENTS, then quantizes to
    * thousands-of-dollars units (integer div) so sᵢ ≤ ~4e6 at sf0.1 and
    * both Σsᵢ² and S² sit orders of magnitude inside Long — a
    * structural bound, not a data-dependent hope. The
    * concentration/skew audit for partitioning decisions as much as for
    * markets: HHI → 1 means one supplier (or one key) dominates. */
  private val q140: Q = (s, dir) => {
    val revenue = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("region"), col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("cents"))
      .select(col("region"), expr("cents div 100000").as("s_i"))
    revenue.groupBy(col("region"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_i") * col("s_i")).as("sum_sq"), sum(col("s_i")).as("total"))
      .select(col("region"), col("n_suppliers"),
        StableRound.tieStableRound(
          col("sum_sq").cast("double") / (col("total") * col("total")).cast("double"),
          8).as("hhi"))
      .orderBy(col("region"))
  }

  private val q140Sql = {
    val hhi = "CAST(sum_sq AS DOUBLE) / CAST(total * total AS DOUBLE)"
    s"""WITH rev AS (
         SELECT region,
                CAST(cents AS BIGINT) // 100000 AS s_i
         FROM (SELECT n_regionkey AS region, l_suppkey,
                      CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
               FROM lineitem
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
               GROUP BY 1, 2)),
       agg AS (SELECT region, CAST(count(*) AS BIGINT) AS n_suppliers,
                      CAST(sum(s_i * s_i) AS BIGINT) AS sum_sq,
                      CAST(sum(s_i) AS BIGINT) AS total
               FROM rev GROUP BY region)
       SELECT region, n_suppliers, ${StableRound.sql(hhi, 8)} AS hhi
       FROM agg ORDER BY region"""
  }

  /** q145 — NATIVE batch session windows: Spark's `session_window`
    * operator (gap-merged dynamic windows inside the aggregation,
    * no self-join, no lag scan) over the same 30-minute-gap semantics
    * q14 builds by hand with lag/running-sum — the q34/q35 pattern:
    * two different engines, one truth. Boundary rule: an event exactly
    * `gap` after the previous one starts a NEW session (session
    * intervals are half-open), hence the `>=` in the oracle's gap
    * test. */
  private val q145: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .select(col("user_id"), col("n_events"),
        coalesce(col("cents"), lit(0L)).as("sum_cents"),
        unix_millis(col("session_window.start")).as("started_ms"),
        unix_millis(col("session_window.end")).as("ended_ms"))
      .orderBy(col("user_id"), col("started_ms"))

  private val q145Sql =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
              CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0) AS BIGINT) AS sum_cents,
              epoch_ms(min(ts)) AS started_ms,
              epoch_ms(max(ts)) + 1800000 AS ended_ms
       FROM (
         SELECT user_id, ts, value,
                sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         FROM (
           SELECT user_id, ts, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                       THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)))
       GROUP BY user_id, session_no ORDER BY user_id, started_ms"""

  /** q146 — period-over-period reporting: weekly order revenue per
    * priority with the week-over-week relative change — cents-exact
    * weekly sums, change as ONE division of exact integers (an integer
    * basis-point div would diverge on negative deltas: Spark `div`
    * truncates toward zero, DuckDB `//` floors). */
  private val q146: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("week"))
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"),
        to_date(date_trunc("week", col("o_orderdate"))).as("week"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("revenue_cents"))
      .withColumn("prev", lag(col("revenue_cents"), 1).over(w))
      .withColumn("week", date_format(col("week"), "yyyy-MM-dd"))
      .select(col("o_orderpriority"), col("week"), col("revenue_cents"),
        StableRound.tieStableRound(
          (col("revenue_cents") - col("prev")).cast("double") /
            when(col("prev") === 0, null).otherwise(col("prev")).cast("double"),
          6).as("wow_change"))
      .orderBy(col("o_orderpriority"), col("week"))
  }

  private val q146Sql = {
    val change = "CAST(revenue_cents - prev AS DOUBLE) / CAST(nullif(prev, 0) AS DOUBLE)"
    s"""WITH weekly AS (
         SELECT o_orderpriority, CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM orders GROUP BY 1, 2),
       lagged AS (
         SELECT o_orderpriority, week, revenue_cents,
                lag(revenue_cents, 1) OVER (PARTITION BY o_orderpriority ORDER BY week) AS prev
         FROM weekly)
       SELECT o_orderpriority, strftime(week, '%Y-%m-%d') AS week, revenue_cents,
              ${StableRound.sql(change, 6)} AS wow_change
       FROM lagged ORDER BY o_orderpriority, week"""
  }

  /** q147 — incremental view maintenance: a per-(type, day) aggregate
    * view maintained from a delta batch (event_id ≡ 0 mod 10) against
    * the standing base aggregate — only DELTAS aggregate and shuffle,
    * history is never rescanned (at 100 TB the base agg is a persisted
    * table; this full-outer merge is the whole nightly job). Output
    * carries the audit columns (n_base, n_delta) alongside the merged
    * view so a maintenance bug is visible in the artifact. */
  private val q147: Q = (s, dir) => {
    def agg(delta: Boolean) = Tables.events(s, dir)
      .filter(if (delta) col("event_id") % 10 === 0 else col("event_id") % 10 =!= 0)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(floor(coalesce(col("value"), lit(0.0)) * 100 + 0.5).cast("long")).as("cents"))
    agg(delta = false).select(col("event_type"), col("day"),
        col("n").as("n_base"), col("cents").as("c_base"))
      .join(agg(delta = true).select(col("event_type"), col("day"),
        col("n").as("n_delta"), col("cents").as("c_delta")),
        Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L))).as("n_total"),
        (coalesce(col("c_base"), lit(0L)) + coalesce(col("c_delta"), lit(0L))).as("cents_total"))
      .orderBy(col("event_type"), col("day"))
  }

  private val q147Sql =
    """WITH b AS (SELECT event_type, CAST(ts AS DATE) AS day,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(CAST(floor(coalesce(value, 0.0) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
                  FROM events WHERE event_id % 10 != 0 GROUP BY 1, 2),
            d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(CAST(floor(coalesce(value, 0.0) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
                  FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2)
       SELECT coalesce(b.event_type, d.event_type) AS event_type,
              strftime(coalesce(b.day, d.day), '%Y-%m-%d') AS day,
              coalesce(b.n, 0) AS n_base, coalesce(d.n, 0) AS n_delta,
              coalesce(b.n, 0) + coalesce(d.n, 0) AS n_total,
              coalesce(b.cents, 0) + coalesce(d.cents, 0) AS cents_total
       FROM b FULL OUTER JOIN d ON b.event_type = d.event_type AND b.day = d.day
       ORDER BY event_type, day"""

  /** q148 — time-travel read over the q86 SCD2 history: the orders
    * dimension AS OF 1995-06-01 — one validity-interval filter over the
    * version chain, the lakehouse `VERSION AS OF` read without the
    * engine dependency. */
  private val q148: Q = (s, dir) => {
    orderVersions(s, dir)
      .filter(col("valid_from") <= lit("1995-06-01").cast("date") &&
        (col("valid_to").isNull || col("valid_to") > lit("1995-06-01").cast("date")))
      .select(col("o_orderkey"), col("status"), col("price"))
      .orderBy(col("o_orderkey"))
  }

  private val q148Sql =
    s"""WITH $versionsCte
       SELECT o_orderkey, status, price FROM v
       WHERE valid_from <= DATE '1995-06-01'
         AND (valid_to IS NULL OR valid_to > DATE '1995-06-01')
       ORDER BY o_orderkey"""

  /** The q86/q148 SCD2 version chain, shared by the time-travel read and
    * the point-in-time join. */
  private def orderVersions(s: SparkSession, dir: String): DataFrame = {
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
  }

  /** The shared SQL prefix building the same version chain (v).
    * A def, not a val: q148Sql initializes before this point in the
    * object, and a forward val reference would read null at init. */
  private def versionsCte = {
    val priced = StableRound.sql("o_totalprice * 1.1", 2)
    s"""base AS (SELECT o_orderkey, o_orderdate AS eff_ts,
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
             FROM chg)"""
  }

  /** q149 — POINT-IN-TIME dimension join: every lineitem picks up the
    * order-dimension version valid at its SHIP date — the feature-store
    * correctness primitive that prevents training-serving skew (joining
    * today's dimension onto yesterday's facts leaks the future). The
    * SCD2 chain is gap-free, so the backward as-of join
    * ([[graft.operators.AsofJoin]] — one shuffle, no per-key blow-up)
    * is exactly the validity-interval join the oracle states
    * literally. */
  private val q149: Q = (s, dir) => {
    val facts = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
        col("l_shipdate"))
    graft.operators.AsofJoin.backward(
        facts, orderVersions(s, dir),
        keys = Seq("o_orderkey"), leftTs = "l_shipdate", rightTs = "valid_from",
        rightPayload = Seq("status", "price"))
      .select(col("o_orderkey").as("l_orderkey"), col("l_linenumber"),
        col("status"), col("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("status"))
  }

  private val q149Sql =
    s"""WITH $versionsCte
       SELECT f.l_orderkey, f.l_linenumber, v.status, v.price
       FROM lineitem f LEFT JOIN v
         ON v.o_orderkey = f.l_orderkey
        AND v.valid_from <= f.l_shipdate
        AND (v.valid_to IS NULL OR v.valid_to > f.l_shipdate)
       ORDER BY f.l_orderkey, f.l_linenumber, v.status"""

  /** q150 — funnel drop-off rates (the aggregate q87's per-user stage
    * trace feeds): users reaching view → later click → later purchase,
    * with stage-over-stage conversion as single divisions of exact
    * counts. Strictly-increasing timestamps between stages (the q87
    * ordering discipline). */
  private val q150: Q = (s, dir) => {
    val e = Tables.events(s, dir)
    def stage(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"))
    val t1 = stage("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = stage("click").join(t1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = stage("purchase").join(t2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val n0 = e.select(col("user_id")).distinct().count()
    val n1 = t1.count(); val n2 = t2.count(); val n3 = t3.count()
    def rate(a: Long, b: Long) =
      if (b == 0) lit(null).cast("double")
      else StableRound.tieStableRound(lit(a.toDouble / b), 6)
    val spark = s
    import spark.implicits._
    Seq((n0, n1, n2, n3)).toDF("n_users", "n_view", "n_view_click", "n_full_funnel")
      .withColumn("rate_view", rate(n1, n0))
      .withColumn("rate_click", rate(n2, n1))
      .withColumn("rate_purchase", rate(n3, n2))
  }

  private val q150Sql = {
    def r(e: String) = StableRound.sql(e, 6)
    s"""WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
       t2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN t1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id),
       t3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN t2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id),
       c AS (SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
                    CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_view,
                    CAST((SELECT count(*) FROM t2) AS BIGINT) AS n_view_click,
                    CAST((SELECT count(*) FROM t3) AS BIGINT) AS n_full_funnel)
       SELECT n_users, n_view, n_view_click, n_full_funnel,
              ${r("CAST(n_view AS DOUBLE) / CAST(nullif(n_users, 0) AS DOUBLE)")} AS rate_view,
              ${r("CAST(n_view_click AS DOUBLE) / CAST(nullif(n_view, 0) AS DOUBLE)")} AS rate_click,
              ${r("CAST(n_full_funnel AS DOUBLE) / CAST(nullif(n_view_click, 0) AS DOUBLE)")} AS rate_purchase
       FROM c"""
  }

  val defs: Map[String, Q] = Map(
    "q137_cdc_apply"   -> q137,
    "q138_attribution" -> q138,
    "q139_twap"        -> q139,
    "q140_hhi"         -> q140,
    "q145_session_window" -> q145,
    "q146_wow_change"  -> q146,
    "q147_ivm_merge"   -> q147,
    "q148_time_travel" -> q148,
    "q149_pit_join"    -> q149,
    "q150_funnel_rates" -> q150)

  val oracles: Map[String, String] = Map(
    "q137_cdc_apply"   -> q137Sql,
    "q138_attribution" -> q138Sql,
    "q139_twap"        -> q139Sql,
    "q140_hhi"         -> q140Sql,
    "q145_session_window" -> q145Sql,
    "q146_wow_change"  -> q146Sql,
    "q147_ivm_merge"   -> q147Sql,
    "q148_time_travel" -> q148Sql,
    "q149_pit_join"    -> q149Sql,
    "q150_funnel_rates" -> q150Sql)
}
