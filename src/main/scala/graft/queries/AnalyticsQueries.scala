package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.{Bfs, PageRank}
import graft.operators.{AsofJoin, Evaluation, FuzzyJoin, GapFill, RangeJoin, Skyline, SortedNeighborhood}
import graft.functions.StableRound
import graft.sketch.Kmv

/** Temporal joins, graph analytics, and sketch operators over the star
  * schema — the relational plane a feature-store / training-data engine
  * needs beyond plain joins: point-in-time correctness (as-of), bounded
  * time-window matching (range join), iterative graph traversal
  * (BFS / PageRank), and engine-reproducible cardinality sketches (KMV).
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def purchases(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))

  /** Clicks deduped to one row per (user, ts) so the as-of match is
    * deterministic under timestamp ties. */
  private def clicksDeduped(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("cts"))
      .agg(max(col("event_id")).as("click_id"))

  /** q71 — backward as-of join: each purchase picks up the most recent
    * click (≤ purchase time) by the same user. Oracle: DuckDB's native
    * ASOF LEFT JOIN — an independent implementation of the same
    * semantics, so the union-window construction is cross-checked
    * against a real interval-search engine. */
  private val q71: Q = (s, dir) => {
    val joined = AsofJoin.backward(
      purchases(s, dir), clicksDeduped(s, dir),
      keys = Seq("user_id"), leftTs = "ts", rightTs = "cts",
      rightPayload = Seq("click_id"))
    joined.select(
      col("event_id"), col("user_id"), col("ts"),
      col("click_id"), col("matched_ts").as("click_ts"),
      (unix_micros(col("ts")) - unix_micros(col("matched_ts"))).as("gap_us"))
  }

  private val q71Sql =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts AS cts, max(event_id) AS click_id
                  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
       SELECT p.event_id, p.user_id, p.ts, c.click_id, c.cts AS click_ts,
              epoch_us(p.ts) - epoch_us(c.cts) AS gap_us
       FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.cts"""

  /** q72 — range join: per purchase, how many clicks by the same user in
    * the preceding hour. The bucketed equi-join construction (2× left
    * fan-out, no theta-join) vs DuckDB's inequality join. */
  private val q72: Q = (s, dir) => {
    val p = purchases(s, dir)
    val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
    val pairs = RangeJoin.pairsPreceding(p, clicks,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "cts",
      spanMicros = 3600L * 1000000L, rightPayload = Seq("click_id"))
    val counts = pairs.groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
    p.join(counts, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }

  private val q72Sql =
    """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts AS cts, event_id AS click_id
                  FROM events WHERE event_type = 'click')
       SELECT p.event_id, p.user_id, count(c.click_id) AS n_clicks
       FROM p LEFT JOIN c
         ON p.user_id = c.user_id
        AND c.cts > p.ts - INTERVAL 1 HOUR AND c.cts <= p.ts
       GROUP BY p.event_id, p.user_id"""

  /** The supply-chain DAG: part → supplier (ships it) → nation → region,
    * with ids namespaced per entity type. */
  private def supplyEdges(s: SparkSession, dir: String): DataFrame = {
    val e1 = Tables.lineitem(s, dir).select(
      concat(lit("P:"), col("l_partkey")).as("src"),
      concat(lit("S:"), col("l_suppkey")).as("dst"))
    val e2 = Tables.supplier(s, dir).select(
      concat(lit("S:"), col("s_suppkey")).as("src"),
      concat(lit("N:"), col("s_nationkey")).as("dst"))
    val e3 = Tables.nation(s, dir).select(
      concat(lit("N:"), col("n_nationkey")).as("src"),
      concat(lit("R:"), col("n_regionkey")).as("dst"))
    e1.unionByName(e2).unionByName(e3)
  }

  private val supplyEdgesSql =
    """SELECT DISTINCT 'P:' || l_partkey AS src, 'S:' || l_suppkey AS dst FROM lineitem
       UNION
       SELECT DISTINCT 'S:' || s_suppkey, 'N:' || s_nationkey FROM supplier
       UNION
       SELECT DISTINCT 'N:' || n_nationkey, 'R:' || n_regionkey FROM nation"""

  /** q73 — k-hop BFS reachability (min depth ≤ 3) from small parts
    * through the supply DAG. Oracle: recursive CTE with min-depth
    * aggregation — the declarative twin of the iterative frontier loop. */
  private val q73: Q = (s, dir) => {
    val seeds = Tables.part(s, dir).filter(col("p_size") <= 5)
      .select(concat(lit("P:"), col("p_partkey")).as("node"))
    Bfs.reach(supplyEdges(s, dir), seeds, maxDepth = 3)
  }

  private val q73Sql =
    s"""WITH RECURSIVE
          e AS ($supplyEdgesSql),
          seeds AS (SELECT 'P:' || p_partkey AS node FROM part WHERE p_size <= 5),
          walk(node, d) AS (
            SELECT node, 0 FROM seeds
            UNION ALL
            SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node WHERE w.d < 3)
        SELECT node, min(d) AS depth FROM walk GROUP BY node"""

  /** q160 — UNBOUNDED transitive closure (min depth, run-until-drain)
    * over the dense customer-key ancestor hierarchy k → k div 2 — a
    * functional DAG ~log2(N) levels deep (14 levels at sf0.1), so
    * [[Bfs.closure]]'s periodic localCheckpoint lineage collapse
    * (every 4 levels here) genuinely exercises. Oracle: recursive CTE;
    * the hierarchy is strictly decreasing, so the recursion terminates
    * naturally and min-depth grouping matches BFS level semantics. */
  private val q160: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val edges = c.filter(col("c_custkey") > 1).select(
      col("c_custkey").cast("long").as("src"),
      floor(col("c_custkey") / 2).cast("long").as("dst"))
    val seeds = c.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").cast("long").as("node"))
    Bfs.closure(edges, seeds, checkpointEvery = 4)
  }

  private val q160Sql =
    """WITH RECURSIVE
         e AS (SELECT CAST(c_custkey AS BIGINT) AS src,
                      CAST(c_custkey // 2 AS BIGINT) AS dst
               FROM customer WHERE c_custkey > 1),
         seeds AS (SELECT CAST(c_custkey AS BIGINT) AS node
                   FROM customer WHERE c_custkey % 97 = 0),
         walk(node, d) AS (
           SELECT node, 0 FROM seeds
           UNION ALL
           SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node)
       SELECT node, min(d) AS depth FROM walk GROUP BY node"""

  /** q74 — 5-iteration PageRank over the supply DAG (damping 0.85,
    * dangling mass redistributed uniformly). Oracle: the five power
    * iterations unrolled into chained CTEs. Ranks are rounded to 9
    * decimals on both sides — the engines sum contributions in different
    * orders, so raw doubles differ in the last ulps. */
  private val q74: Q = (s, dir) => {
    PageRank.run(supplyEdges(s, dir), iterations = 5, d = 0.85)
      .select(col("node"), round(col("rank"), 9).as("rank"))
  }

  private val q74Sql: String = {
    val base =
      s"""WITH e AS ($supplyEdgesSql),
          nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
          nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
          ann AS (SELECT e.src, e.dst, o.outdeg FROM e
                  JOIN (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
                        FROM e GROUP BY src) o USING (src)),
          r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    val iters = (1 to 5).map { i =>
      s"""d$i AS (SELECT COALESCE(sum(rank), 0) AS dang FROM r${i - 1}
                  WHERE node NOT IN (SELECT DISTINCT src FROM ann)),
          r$i AS (
            SELECT n.node,
                   0.15 / (SELECT n FROM nn)
                   + 0.85 * (COALESCE(c.inflow, 0) + (SELECT dang FROM d$i) / (SELECT n FROM nn)) AS rank
            FROM nodes n LEFT JOIN (
              SELECT a.dst AS node, sum(r.rank / a.outdeg) AS inflow
              FROM ann a JOIN r${i - 1} r ON a.src = r.node
              GROUP BY a.dst) c USING (node))"""
    }.mkString(",\n")
    s"$base,\n$iters\nSELECT node, round(rank, 9) AS rank FROM r5"
  }

  /** q75 — KMV bottom-k distinct sketch: estimated distinct parts per
    * return flag (k = 128). The md5-derived 60-bit hash is identical in
    * both engines, so the estimate — not just the true cardinality — is
    * reproduced exactly: the oracle re-derives the same sketch. */
  private val q75: Q = (s, dir) =>
    Kmv.estimateDistinct(Tables.lineitem(s, dir),
      groupCols = Seq("l_returnflag"), valueCol = "l_partkey", k = 128)

  private val q75Sql =
    """WITH h AS (SELECT DISTINCT l_returnflag,
                    CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
                  FROM lineitem),
            ranked AS (SELECT l_returnflag, hv,
                              row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
                       FROM h)
       SELECT l_returnflag,
              CASE WHEN max(rn) <= 128 THEN CAST(max(rn) AS DOUBLE)
                   ELSE 127.0 / (CAST(max(CASE WHEN rn = 128 THEN hv END) AS DOUBLE)
                                 / 1152921504606846976.0)
              END AS est_distinct
       FROM ranked WHERE rn <= 129
       GROUP BY l_returnflag"""

  /** q76 — exact distributed quantiles: p25/p50/p75 of event value per
    * type (continuous interpolation). Exact percentile sorts each
    * group's values — fine per group here; the 100 TB path is
    * approx_percentile (t-digest, mergeable, bounded state), asserted
    * equivalent-within-ε in the spec. Rounded: the two engines
    * interpolate in a different operation order. */
  private val q76: Q = (s, dir) =>
    Tables.events(s, dir).groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("p25"),
        round(expr("percentile(value, 0.50)"), 6).as("p50"),
        round(expr("percentile(value, 0.75)"), 6).as("p75"),
        count(lit(1)).as("n"))

  private val q76Sql =
    """SELECT event_type,
              round(quantile_cont(value, 0.25), 6) AS p25,
              round(quantile_cont(value, 0.50), 6) AS p50,
              round(quantile_cont(value, 0.75), 6) AS p75,
              count(*) AS n
       FROM events GROUP BY event_type"""

  /** q77 — count-min heavy hitters: CMS point estimates (d=4, w=256) for
    * every user's event count, alongside the exact count (est ≥ exact
    * always; the gap is the sketch's collision overestimate). The oracle
    * rebuilds the identical d×w grid from the same md5 hash family —
    * checking the sketch itself, not just the answer. */
  private val q77: Q = (s, dir) => {
    val events = Tables.events(s, dir)
    val est = graft.sketch.CountMin.estimateCounts(events, "user_id", d = 4, w = 256)
    val exact = events.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
    est.join(exact, "user_id")
      .select(col("user_id"), col("est"), col("exact"))
  }

  private val q77Sql =
    """WITH rows_i AS (SELECT unnest([0, 1, 2, 3]) AS row_i),
            cells AS (
              SELECT row_i,
                     CAST(concat('0x', substr(md5(row_i || ':' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS bucket,
                     count(*) AS cnt
              FROM events CROSS JOIN rows_i GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT user_id, row_i,
                     CAST(concat('0x', substr(md5(row_i || ':' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS bucket
              FROM events CROSS JOIN rows_i),
            est AS (
              SELECT c.user_id, min(cells.cnt) AS est
              FROM cand c JOIN cells USING (row_i, bucket) GROUP BY c.user_id)
       SELECT e.user_id, e.est, x.exact
       FROM est e JOIN (SELECT user_id, count(*) AS exact FROM events GROUP BY user_id) x
       USING (user_id)"""

  /** q78 — deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis, content-addressed): top-50 documents by
    * -ln(u)/n_chars rank. Both engines evaluate the identical closed-form
    * rank, so the SAMPLE ITSELF is oracled, not a summary of it. */
  private val q78: Q = (s, dir) =>
    graft.pipeline.Sampling.weightedTopK(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        col("doc_id"), "n_chars", k = 50)
      .select(col("doc_id"), col("es_rank"))

  private val q78Sql =
    """SELECT doc_id,
              round(-ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                        / 1152921504606846976.0) / n_chars, 9) AS es_rank
       FROM documents ORDER BY es_rank, doc_id LIMIT 50"""

  /** The co-purchase graph: two parts are adjacent when some urgent order
    * contains both. Restricted to p_size ≤ 25 so the wedge space stays
    * proportionate to the scale factor (the full graph works too — the
    * degree orientation in [[graft.graph.Triangles]] is the scale guard —
    * but the oracle must also enumerate it). */
  private def coPartEdges(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val smallParts = Tables.part(s, dir)
      .filter(col("p_size") <= 25).select(col("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.alias("x").join(li.alias("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").cast("string").as("src"),
              col("y.pk").cast("string").as("dst"))
  }

  /** q79 — per-node triangle counts over the co-purchase graph
    * (degree-oriented wedge enumeration). The oracle enumerates the same
    * triangle set by id order — orientation is physical, the set is not. */
  private val q79: Q = (s, dir) =>
    graft.graph.Triangles.perNode(coPartEdges(s, dir))
      .select(col("node").cast("long").as("node"), col("n_tri"))

  private val q79Sql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk
                   FROM lineitem
                   JOIN orders ON l_orderkey = o_orderkey
                   JOIN part   ON l_partkey = p_partkey
                   WHERE o_orderpriority = '1-URGENT' AND p_size <= 25),
            e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
                  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
            tri AS (SELECT e1.a, e1.b, e2.b AS c
                    FROM e e1
                    JOIN e e2 ON e2.a = e1.b
                    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
            n AS (SELECT a AS node FROM tri
                  UNION ALL SELECT b FROM tri
                  UNION ALL SELECT c FROM tri)
       SELECT node, count(*) AS n_tri FROM n GROUP BY node"""

  /** q80 — neighborhood Jaccard: supplier pairs scored by the small parts
    * (p_size ≤ 5) they both ship. Exact-integer ratio → tie-stable
    * rounding reproduces bit-identically. */
  private val q80: Q = (s, dir) => {
    val smallParts = Tables.part(s, dir)
      .filter(col("p_size") <= 5).select(col("p_partkey"))
    val edges = Tables.lineitem(s, dir)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_suppkey").as("src"), col("l_partkey").as("feat"))
    graft.graph.NodeSimilarity.jaccard(edges, minCommon = 3)
  }

  private val q80Sql = {
    val j = graft.functions.StableRound.sql(
      "CAST(n_common AS DOUBLE) / CAST(d1 + d2 - n_common AS DOUBLE)", 6)
    s"""WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS feat
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   WHERE p_size <= 5),
            deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
            inter AS (SELECT x.src AS s1, y.src AS s2, count(*) AS n_common
                      FROM e x JOIN e y ON x.feat = y.feat AND x.src < y.src
                      GROUP BY x.src, y.src
                      HAVING count(*) >= 3)
       SELECT s1, s2, n_common, $j AS jaccard
       FROM inter
       JOIN (SELECT src AS s1, deg AS d1 FROM deg) USING (s1)
       JOIN (SELECT src AS s2, deg AS d2 FROM deg) USING (s2)"""
  }

  /** The supply DAG restricted to small parts (p_size ≤ 10) — a
    * several-thousand-node subgraph whose 4-superstep label frontier the
    * oracle can afford to unroll. */
  private def smallSupplyEdges(s: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(s, dir)
      .filter(col("p_size") <= 10).select(col("p_partkey"))
    val e1 = Tables.lineitem(s, dir)
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .select(concat(lit("P:"), col("l_partkey")).as("src"),
              concat(lit("S:"), col("l_suppkey")).as("dst"))
    val e2 = Tables.supplier(s, dir).select(
      concat(lit("S:"), col("s_suppkey")).as("src"),
      concat(lit("N:"), col("s_nationkey")).as("dst"))
    val e3 = Tables.nation(s, dir).select(
      concat(lit("N:"), col("n_nationkey")).as("src"),
      concat(lit("R:"), col("n_regionkey")).as("dst"))
    e1.unionByName(e2).unionByName(e3)
  }

  /** q81 — 4 supersteps of synchronous min-label propagation (hash-min
    * connected components in flight) over the small-part supply graph.
    * Oracle: the supersteps unrolled into materialized chained CTEs. */
  private val q81: Q = (s, dir) =>
    graft.graph.LabelPropagation.run(smallSupplyEdges(s, dir), iterations = 4)

  private val q81Sql: String = {
    val base =
      """WITH ed AS MATERIALIZED (
           SELECT DISTINCT 'P:' || l_partkey AS src, 'S:' || l_suppkey AS dst
           FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size <= 10
           UNION SELECT DISTINCT 'S:' || s_suppkey, 'N:' || s_nationkey FROM supplier
           UNION SELECT DISTINCT 'N:' || n_nationkey, 'R:' || n_regionkey FROM nation),
         e AS MATERIALIZED (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
         l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM e)"""
    val iters = (1 to 4).map { i =>
      s"""l$i AS MATERIALIZED (
            SELECT l.node, least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
            FROM l${i - 1} l
            LEFT JOIN e ON e.src = l.node
            LEFT JOIN l${i - 1} n ON n.node = e.dst
            GROUP BY l.node, l.lbl)"""
    }.mkString(",\n")
    s"$base,\n$iters\nSELECT node, lbl FROM l4"
  }

  /** q91 — first-order Markov transition matrix over the event stream:
    * per-user event sequences (timestamp ties collapsed to the max-id
    * event so the order is total), lag-window transitions, and per-state
    * transition probabilities. The classic session-path / user-journey
    * summary; windows partition by user, never globally. */
  private val q91: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("event_type"), col("event_id")).as("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val trans = ev
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    val counts = trans
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    counts.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        graft.functions.StableRound.tieStableRound(
          col("n").cast("double") / col("tot").cast("double"), 6).as("p"))
  }

  private val q91Sql = {
    val p = graft.functions.StableRound.sql(
      "CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)", 6)
    s"""WITH e AS (SELECT user_id, ts, arg_max(event_type, event_id) AS event_type
                   FROM events GROUP BY 1, 2),
            tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS from_type,
                          event_type AS to_type
                   FROM e),
            c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
                  FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2),
            t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
       SELECT c.from_type, c.to_type, c.n, $p AS p
       FROM c JOIN t USING (from_type)"""
  }

  /** q92 — robust outlier detection per group: median and MAD (median
    * absolute deviation), outliers flagged beyond 3·1.4826·MAD — the
    * scale-resistant alternative to z-scores (q83) that one wild value
    * cannot drag. Median/MAD are tie-stable-rounded BEFORE the deviation
    * and threshold comparisons, so both engines compare identical
    * doubles. Exact percentile per group here; the 100 TB path swaps in
    * approx_percentile (t-digest, mergeable, bounded state). */
  private val q92: Q = (s, dir) => {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val med = ev.groupBy(col("event_type"))
      .agg(graft.functions.StableRound.tieStableRound(
        expr("percentile(value, 0.5)"), 6).as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(graft.functions.StableRound.tieStableRound(
        expr("percentile(dev, 0.5)"), 6).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), lit(1L))
          .otherwise(lit(0L))).as("n_out"))
  }

  private val q92Sql =
    """WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
            med AS (SELECT event_type,
                           floor(quantile_cont(value, 0.5) * 1000000 + 0.5) / 1000000 AS med
                    FROM ev GROUP BY 1),
            d AS (SELECT ev.event_type, med.med, abs(ev.value - med.med) AS dev
                  FROM ev JOIN med USING (event_type)),
            md AS (SELECT event_type,
                          floor(quantile_cont(dev, 0.5) * 1000000 + 0.5) / 1000000 AS mad
                   FROM d GROUP BY 1)
       SELECT d.event_type, d.med, md.mad, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN d.dev > CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * md.mad
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_out
       FROM d JOIN md USING (event_type)
       GROUP BY 1, 2, 3"""

  /** q96 — market-basket association rules over order baskets (small
    * parts, p_size ≤ 10): pair support, directional confidence, and
    * lift. The Apriori L2 core as three map-combined aggregations plus
    * one basket self-join — no candidate explosion beyond co-occurring
    * pairs. Ratios are exact-integer divisions, tie-stable rounded. */
  private val q96: Q = (s, dir) => {
    val r6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.StableRound.tieStableRound(c, 6)
    val small = Tables.part(s, dir).filter(col("p_size") <= 10)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .join(broadcast(small), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    // one bounded scalar: total baskets (all orders with any lineitem)
    val nBaskets = Tables.lineitem(s, dir).select(col("l_orderkey"))
      .distinct().count().toDouble
    val supp = li.groupBy(col("pk")).agg(count(lit(1)).as("supp"))
    val pairs = li.alias("x")
      .join(li.alias("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    pairs
      .join(supp.select(col("pk").as("a"), col("supp").as("supp_a")), Seq("a"))
      .join(supp.select(col("pk").as("b"), col("supp").as("supp_b")), Seq("b"))
      .select(col("a"), col("b"), col("n_ab"), col("supp_a"), col("supp_b"),
        r6(col("n_ab").cast("double") / col("supp_a").cast("double")).as("conf_ab"),
        r6(col("n_ab").cast("double") / col("supp_b").cast("double")).as("conf_ba"),
        r6(col("n_ab").cast("double") * lit(nBaskets) /
          (col("supp_a").cast("double") * col("supp_b").cast("double"))).as("lift"))
  }

  private val q96Sql = {
    def r6(e: String) = graft.functions.StableRound.sql(e, 6)
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_size <= 10),
            nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n FROM lineitem),
            supp AS (SELECT pk, CAST(count(*) AS BIGINT) AS supp FROM li GROUP BY 1),
            pr AS (SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS n_ab
                   FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
                   GROUP BY 1, 2 HAVING count(*) >= 2)
       SELECT pr.a, pr.b, pr.n_ab, sa.supp AS supp_a, sb.supp AS supp_b,
              ${r6("CAST(pr.n_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE)")} AS conf_ab,
              ${r6("CAST(pr.n_ab AS DOUBLE) / CAST(sb.supp AS DOUBLE)")} AS conf_ba,
              ${r6("CAST(pr.n_ab AS DOUBLE) * (SELECT n FROM nb) / (CAST(sa.supp AS DOUBLE) * CAST(sb.supp AS DOUBLE))")} AS lift
       FROM pr
       JOIN supp sa ON sa.pk = pr.a
       JOIN supp sb ON sb.pk = pr.b"""
  }

  /** q97 — HyperLogLog distinct users per event type (m = 64 registers,
    * deterministic md5 registers), alongside the exact count. The oracle
    * REBUILDS the registers and the estimate — the sketch construction
    * itself is under the hash gate, like the count-min (q77) and KMV
    * (q75) rows. */
  private val q97: Q = (s, dir) =>
    graft.sketch.Hll.estimateDistinct(Tables.events(s, dir),
      groupCols = Seq("event_type"), valueCol = "user_id")

  private val q97Sql =
    """WITH h AS (SELECT DISTINCT event_type,
                    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
                  FROM events),
            rk AS (SELECT event_type, hv >> 54 AS idx,
                          CASE WHEN (hv & 18014398509481983) = 0 THEN 55
                               ELSE 55 - length(bin(hv & 18014398509481983))
                          END AS rank
                   FROM h),
            reg AS (SELECT event_type, idx, max(rank) AS mj FROM rk GROUP BY 1, 2),
            agg AS (SELECT event_type,
                           CAST(sum(CAST(1 AS BIGINT) << CAST(55 - mj AS INTEGER)) AS BIGINT) AS s_present,
                           CAST(count(*) AS BIGINT) AS n_present
                    FROM reg GROUP BY 1),
            est AS (SELECT event_type, 64 - n_present AS zeros,
                           s_present + (64 - n_present) * 36028797018963968 AS s_total
                    FROM agg),
            raw AS (SELECT event_type, zeros,
                           CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
                             * CAST(36028797018963968.0 AS DOUBLE)
                             / CAST(s_total AS DOUBLE) AS e
                    FROM est),
            fin AS (SELECT event_type,
                           CASE WHEN e <= 160.0 AND zeros > 0
                                THEN CAST(64.0 AS DOUBLE) * ln(CAST(64.0 AS DOUBLE) / CAST(zeros AS DOUBLE))
                                ELSE e END AS est
                    FROM raw),
            ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact
                   FROM events GROUP BY 1)
       SELECT f.event_type, floor(f.est * 1000000 + 0.5) / 1000000 AS hll_est, ex.exact
       FROM fin f JOIN ex ON ex.event_type = f.event_type"""

  /** q98 — exponential time-decay engagement score per user (half-life
    * = 1 day): weight 2^−age_days, ages clamped at 50 so the weight
    * stays an EXACT power of two and the per-user sum accumulates in
    * integer units of 2^−50 — order-free, engine-free. Ages come from
    * integer microsecond arithmetic (no timezone/date semantics in
    * play). The classic feature-store recency feature, hash-exact. */
  private val q98: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    // one bounded scalar: the corpus' newest event timestamp
    val refMicros = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val r6 = (c: org.apache.spark.sql.Column) =>
      graft.functions.StableRound.tieStableRound(c, 6)
    ev
      .withColumn("age", expr(s"($refMicros - unix_micros(ts)) div 86400000000"))
      .withColumn("age", least(greatest(col("age"), lit(0L)), lit(50L)))
      .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - age AS INT))"))
      .groupBy(col("user_id"))
      .agg(sum(col("w")).as("decay_units"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("decay_units"), col("n_events"),
        r6(col("decay_units").cast("double") / lit(1125899906842624.0))
          .as("decay_score"))
  }

  private val q98Sql = {
    val score = graft.functions.StableRound.sql(
      "CAST(du AS DOUBLE) / CAST(1125899906842624.0 AS DOUBLE)", 6)
    """WITH ref AS (SELECT max(epoch_us(ts)) AS rm FROM events),
            e AS (SELECT user_id,
                         least(greatest((ref.rm - epoch_us(ts)) // 86400000000, 0), 50) AS age
                  FROM events, ref),
            g AS (SELECT user_id,
                         CAST(sum(CAST(1 AS BIGINT) << CAST(50 - age AS INTEGER)) AS BIGINT) AS du,
                         CAST(count(*) AS BIGINT) AS n_events
                  FROM e GROUP BY 1)
       SELECT user_id, du AS decay_units, n_events, """ + score + """ AS decay_score
       FROM g"""
  }

  /** q100 — equi-depth histogram: 8 ntile buckets of event value per
    * type with (lo, hi, n) per bucket — the optimizer-statistics /
    * drift-monitoring summary. Bucket boundaries are exact input values
    * (no arithmetic), ntile order is total (value, event_id), so the
    * histogram reproduces bit-for-bit. Windows partition per type. */
  private val q100: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    Tables.events(s, dir).filter(col("value").isNotNull)
      .withColumn("bucket", ntile(8).over(w))
      .groupBy(col("event_type"), col("bucket"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        count(lit(1)).as("n"))
  }

  private val q100Sql =
    """SELECT event_type, bucket, min(value) AS lo, max(value) AS hi,
              CAST(count(*) AS BIGINT) AS n
       FROM (SELECT event_type, event_id, value,
                    CAST(ntile(8) OVER (PARTITION BY event_type
                      ORDER BY value ASC, event_id ASC) AS INTEGER) AS bucket
             FROM events WHERE value IS NOT NULL)
       GROUP BY 1, 2"""

  /** q104 — blocked fuzzy self-join (PassJoin pigeonhole segments +
    * Levenshtein verify, [[graft.operators.FuzzyJoin]]) over a sampled
    * customer-name set. The oracle is the INDEPENDENT all-pairs
    * construction with a length prefilter — so an exact-recall bug in
    * the blocking (a missed candidate bucket) fails the hash gate, not
    * just a spec. */
  private val q104: Q = (s, dir) => {
    val names = Tables.customer(s, dir)
      .filter(col("c_custkey") % 7 === 0).select(col("c_name"))
    FuzzyJoin.selfJoin(names, "c_name", maxDist = 1)
      .select(col("a"), col("b"), col("dist").cast("int").as("dist"))
  }

  private val q104Sql =
    """WITH s AS (SELECT DISTINCT c_name FROM customer WHERE c_custkey % 7 = 0)
       SELECT x.c_name AS a, y.c_name AS b,
              CAST(levenshtein(x.c_name, y.c_name) AS INTEGER) AS dist
       FROM s x JOIN s y
         ON x.c_name < y.c_name
        AND abs(length(x.c_name) - length(y.c_name)) <= 1
       WHERE levenshtein(x.c_name, y.c_name) <= 1"""

  /** q106 — rolling median-of-3 and mean-of-3 of each user's event
    * values in time order (ties totalized by event_id). The median is a
    * comparator network over (v, lag1, lag2) — NO percentile
    * interpolation, no arithmetic, so it reproduces bit-for-bit; the
    * mean is one fixed-order double sum, identical in both engines.
    * Rows before the window fills are dropped (rn ≥ 3) so every window
    * is exactly 3 values. Windows partition per user — never global. */
  private val q106: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value").as("v"),
        lag(col("value"), 1).over(w).as("v1"),
        lag(col("value"), 2).over(w).as("v2"),
        row_number().over(w).as("rn"))
      .filter(col("rn") >= 3)
      .select(col("user_id"), col("event_id"),
        greatest(least(col("v"), col("v1")),
          least(greatest(col("v"), col("v1")), col("v2"))).as("med3"),
        ((col("v") + col("v1") + col("v2")) / lit(3.0)).as("mean3"))
  }

  private val q106Sql =
    """WITH e AS (SELECT user_id, event_id, value AS v,
                         lag(value, 1) OVER w AS v1,
                         lag(value, 2) OVER w AS v2,
                         row_number() OVER w AS rn
                  FROM events WHERE value IS NOT NULL
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
       SELECT user_id, event_id,
              greatest(least(v, v1), least(greatest(v, v1), v2)) AS med3,
              (v + v1 + v2) / 3.0 AS mean3
       FROM e WHERE rn >= 3"""

  /** q108 — skyline / Pareto frontier (Börzsönyi et al., ICDE 2001) per
    * brand: parts not dominated on (price ↓, size ↑). The engine side is
    * the sorted cummax scan ([[graft.operators.Skyline]]); the oracle is
    * the INDEPENDENT NOT-EXISTS dominance formulation. */
  private val q108: Q = (s, dir) =>
    Skyline.frontier(
        Tables.part(s, dir).select(col("p_brand"), col("p_partkey"),
          col("p_retailprice"), col("p_size")),
        partition = Seq("p_brand"),
        minimize = "p_retailprice", maximize = "p_size")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("p_size"))

  private val q108Sql =
    """SELECT p_brand, p_partkey, p_retailprice, p_size
       FROM part p
       WHERE NOT EXISTS (
         SELECT 1 FROM part q
         WHERE q.p_brand = p.p_brand
           AND q.p_retailprice <= p.p_retailprice
           AND q.p_size >= p.p_size
           AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))"""

  /** q110 — quantile (percent-rank) feature normalization per language:
    * the rank-based score calibration used to make per-source quality
    * scores comparable before mixing. Total order (n_chars, doc_id) →
    * no rank ties → (rank−1)/(n−1) is an exact-integer ratio both
    * engines compute identically. Windows partition per lang. */
  private val q110: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.functions.StableRound.tieStableRound(percent_rank().over(w), 6)
          .as("pr"))
  }

  private val q110Sql = {
    val pr = graft.functions.StableRound.sql(
      "percent_rank() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC)", 6)
    s"""SELECT doc_id, lang, n_chars, $pr AS pr FROM documents"""
  }

  /** q112 — k-core decomposition (Seidman 1983) of the small-part supply
    * graph: 4 synchronous peel rounds at k = 2 ([[graft.graph.KCore]]).
    * Oracle: the peels unrolled into materialized chained CTEs — the
    * same construction discipline as q81's label propagation. */
  private val q112: Q = (s, dir) =>
    graft.graph.KCore.run(smallSupplyEdges(s, dir), k = 2, rounds = 4)

  private val q112Sql: String = {
    val base =
      """WITH ed AS MATERIALIZED (
           SELECT DISTINCT 'P:' || l_partkey AS src, 'S:' || l_suppkey AS dst
           FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size <= 10
           UNION SELECT DISTINCT 'S:' || s_suppkey, 'N:' || s_nationkey FROM supplier
           UNION SELECT DISTINCT 'N:' || n_nationkey, 'R:' || n_regionkey FROM nation),
         e0 AS MATERIALIZED (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed)"""
    val rounds = (1 to 4).map { i =>
      s"""k$i AS MATERIALIZED (SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= 2),
          e$i AS MATERIALIZED (
            SELECT e.src, e.dst FROM e${i - 1} e
            JOIN k$i a ON e.src = a.src
            JOIN k$i b ON e.dst = b.src)"""
    }.mkString(",\n")
    s"$base,\n$rounds\nSELECT src AS node, CAST(count(*) AS BIGINT) AS deg FROM e4 GROUP BY 1"
  }

  /** q115 — sorted-neighborhood entity-resolution blocking
    * ([[SortedNeighborhood]]): window-4 neighbor pairs under name order
    * inside 14-char blocks, verified at Levenshtein ≤ 1. The window is
    * PARTITIONED by the block prefix — no global sort, one hash shuffle.
    * Oracle: the identical lead()-window construction in DuckDB. */
  private val q115: Q = (s, dir) =>
    SortedNeighborhood.candidates(Tables.customer(s, dir),
      idCol = "c_custkey", keyCol = "c_name",
      prefixLen = 14, window = 4, maxDist = 1)

  private val q115Sql = {
    val pair = (i: Int) =>
      s"SELECT id AS id_a, id$i AS id_b, key AS key_a, k$i AS key_b FROM n WHERE id$i IS NOT NULL"
    s"""WITH r AS (SELECT c_custkey AS id, c_name AS key, substr(c_name, 1, 14) AS blk
                   FROM customer),
            n AS (SELECT id, key,
                    lead(id, 1) OVER w AS id1, lead(key, 1) OVER w AS k1,
                    lead(id, 2) OVER w AS id2, lead(key, 2) OVER w AS k2,
                    lead(id, 3) OVER w AS id3, lead(key, 3) OVER w AS k3
                  FROM r WINDOW w AS (PARTITION BY blk ORDER BY key, id)),
            p AS (${pair(1)} UNION ALL ${pair(2)} UNION ALL ${pair(3)})
       SELECT id_a, id_b, key_a, key_b, CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
       FROM p WHERE levenshtein(key_a, key_b) <= 1"""
  }

  /** q117 — Pearson correlation matrix per return flag, ENGINE-STABLE:
    * the co-moment formula r = (n·Σxy − ΣxΣy)/√((n·Σx²−(Σx)²)(n·Σy²−(Σy)²))
    * evaluated over EXACT integer sums — each measure is first scaled to
    * integer cents/basis-points (floor(x·scale + 0.5), one IEEE op on the
    * stored double), summed as decimals (exact), and only the final
    * ratio touches floating point, in an identical expression tree on
    * both engines. A plain corr() of doubles is addition-order-dependent
    * and can never hash-pin. One map-combined groupBy; no second pass. */
  private val q117: Q = (s, dir) => {
    val dec = "decimal(38,0)"
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast(dec).as("x"),
      floor(col("l_quantity") * 100 + 0.5).cast(dec).as("y"),
      floor(col("l_discount") * 10000 + 0.5).cast(dec).as("z"))
    val agg = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n_rows"),
      sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
      sum(col("z")).cast(dec).as("sz"),
      sum(col("x") * col("x")).cast(dec).as("sxx"),
      sum(col("y") * col("y")).cast(dec).as("syy"),
      sum(col("z") * col("z")).cast(dec).as("szz"),
      sum(col("x") * col("y")).cast(dec).as("sxy"),
      sum(col("x") * col("z")).cast(dec).as("sxz"))
    val n = col("n_rows").cast(dec)
    def corr2(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) = {
      val num = (n * sab - sa * sb).cast("double")
      val va  = (n * saa - sa * sa).cast("double")
      val vb  = (n * sbb - sb * sb).cast("double")
      StableRound.tieStableRound(num / sqrt(va * vb), 6)
    }
    agg.select(col("l_returnflag"), col("n_rows"),
      corr2(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")).as("corr_price_qty"),
      corr2(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")).as("corr_price_disc"))
  }

  private val q117Sql = {
    def corr2(sab: String, sa: String, sb: String, saa: String, sbb: String) =
      StableRound.sql(
        s"CAST(n_rows * $sab - $sa * $sb AS DOUBLE) / " +
        s"sqrt(CAST(n_rows * $saa - $sa * $sa AS DOUBLE) * CAST(n_rows * $sbb - $sb * $sb AS DOUBLE))", 6)
    s"""WITH t AS (SELECT l_returnflag,
                     CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x,
                     CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS y,
                     CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS z
                   FROM lineitem),
            a AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n_rows,
                         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
                         CAST(sum(z) AS HUGEINT) AS sz,
                         CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(y * y) AS HUGEINT) AS syy,
                         CAST(sum(z * z) AS HUGEINT) AS szz,
                         CAST(sum(x * y) AS HUGEINT) AS sxy, CAST(sum(x * z) AS HUGEINT) AS sxz
                  FROM t GROUP BY l_returnflag)
       SELECT l_returnflag, CAST(n_rows AS BIGINT) AS n_rows,
              ${corr2("sxy", "sx", "sy", "sxx", "syy")} AS corr_price_qty,
              ${corr2("sxz", "sx", "sz", "sxx", "szz")} AS corr_price_disc
       FROM a"""
  }

  /** q118 — HITS hubs/authorities over the supply DAG, 3 exact-integer
    * iterations ([[graft.graph.Hits]]): unnormalized updates keep every
    * intermediate an exact long (identical in any engine — no
    * addition-order-dependent doubles), one L1 normalization at the end.
    * Oracle: the three integer iterations unrolled into chained CTEs —
    * raw longs compare EXACTLY, shares via the stable rounding. */
  private val q118: Q = (s, dir) =>
    graft.graph.Hits.run(supplyEdges(s, dir), iterations = 3)

  private val q118Sql: String = {
    val base =
      s"""WITH e AS ($supplyEdgesSql),
          nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
          s0 AS (SELECT node, CAST(1 AS BIGINT) AS hub, CAST(1 AS BIGINT) AS auth FROM nodes)"""
    val iters = (1 to 3).map { i =>
      s"""a$i AS (SELECT n.node, CAST(coalesce(x.a, 0) AS BIGINT) AS auth
                  FROM nodes n LEFT JOIN (
                    SELECT e.dst AS node, CAST(sum(s.hub) AS BIGINT) AS a
                    FROM e JOIN s${i - 1} s ON e.src = s.node GROUP BY e.dst) x USING (node)),
          s$i AS (SELECT a.node, CAST(coalesce(h.h, 0) AS BIGINT) AS hub, a.auth
                  FROM a$i a LEFT JOIN (
                    SELECT e.src AS node, CAST(sum(a2.auth) AS BIGINT) AS h
                    FROM e JOIN a$i a2 ON e.dst = a2.node GROUP BY e.src) h USING (node))"""
    }.mkString(",\n")
    val hubShare  = StableRound.sql("CAST(hub AS DOUBLE) / CAST(hs AS DOUBLE)", 9)
    val authShare = StableRound.sql("CAST(auth AS DOUBLE) / CAST(asum AS DOUBLE)", 9)
    s"""$base,
        $iters,
        t AS (SELECT CAST(sum(hub) AS BIGINT) AS hs, CAST(sum(auth) AS BIGINT) AS asum FROM s3)
       SELECT node, hub AS hub_raw, auth AS auth_raw,
              $hubShare AS hub_share, $authShare AS auth_share
       FROM s3, t"""
  }

  /** q119 — ROC AUC of a length-proxy quality score against a word-count
    * label, per language ([[Evaluation.rocAuc]]): the classifier-
    * evaluation primitive a filtering pipeline gates on, in exact
    * rank-sum integers. The window runs over the per-(lang, score)
    * HISTOGRAM, not raw rows. */
  private val q119: Q = (s, dir) =>
    Evaluation.rocAuc(
      Tables.documents(s, dir)
        .withColumn("lbl", size(split(trim(col("text")), " ")) >= 60),
      "lang", "n_chars", "lbl")

  private val q119Sql = {
    val auc = StableRound.sql(
      "CAST(sum_rank2 - n_pos * (n_pos + 1) AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE)", 6)
    s"""WITH t AS (SELECT lang, n_chars AS s,
                     len(string_split(trim(text), ' ')) >= 60 AS lbl
                   FROM documents),
            h AS (SELECT lang, s, CAST(count(*) AS BIGINT) AS cnt,
                    CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS pos
                  FROM t GROUP BY 1, 2),
            r AS (SELECT lang, cnt, pos,
                    CAST(coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
                  FROM h),
            a AS (SELECT lang, CAST(sum(pos) AS BIGINT) AS n_pos,
                    CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_neg,
                    CAST(sum(pos * (2 * cum_before + cnt + 1)) AS BIGINT) AS sum_rank2
                  FROM r GROUP BY 1)
       SELECT lang, n_pos, n_neg, $auc AS auc FROM a"""
  }

  /** q120 — two-sample KS drift statistic per event type
    * ([[Evaluation.ksTest]]): odd vs even event ids over decile-quantized
    * values — sup|F_a − F_b| with an exact cross-multiplied numerator. */
  private val q120: Q = (s, dir) =>
    Evaluation.ksTest(
      Tables.events(s, dir).filter(col("value").isNotNull)
        .withColumn("bucket", floor(col("value") * 10).cast("long"))
        .withColumn("slice", when(col("event_id") % 2 === 0, "a").otherwise("b")),
      "event_type", "bucket", "slice")

  private val q120Sql = {
    val ks = StableRound.sql(
      "CAST(ks_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)", 6)
    s"""WITH t AS (SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS v,
                     CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS sl
                   FROM events WHERE value IS NOT NULL),
            h AS (SELECT event_type, v,
                    CAST(sum(CASE WHEN sl = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                    CAST(sum(CASE WHEN sl = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
                  FROM t GROUP BY 1, 2),
            c AS (SELECT event_type, ca, cb,
                    CAST(sum(ca) OVER w AS BIGINT) AS cum_a,
                    CAST(sum(cb) OVER w AS BIGINT) AS cum_b,
                    CAST(sum(ca) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
                    CAST(sum(cb) OVER (PARTITION BY event_type) AS BIGINT) AS n_b
                  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            m AS (SELECT event_type, n_a, n_b,
                    CAST(max(abs(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS ks_num
                  FROM c GROUP BY 1, 2, 3)
       SELECT event_type, n_a, n_b, $ks AS ks FROM m"""
  }

  /** q121 — end-to-end entity resolution: sorted-neighborhood blocking
    * (q115's candidates) → connected components ([[graft.dedup.Components]],
    * the same large-star/small-star engine as q41) → golden-record
    * survivorship (per cluster: size, and the max-(acctbal, custkey)
    * representative — a deterministic struct-max, no window). The
    * canonical ER dataflow, every stage a reused production operator.
    * Oracle: pair construction + recursive-CTE min-label components +
    * arg-max survivorship in DuckDB. */
  private val q121: Q = (s, dir) => {
    val recs = Tables.customer(s, dir)
    val pairs = SortedNeighborhood.candidates(recs,
      idCol = "c_custkey", keyCol = "c_name", prefixLen = 14, window = 4, maxDist = 1)
    val canon = graft.dedup.Components.canonicalize(
      recs.select(col("c_custkey").as("id")), pairs)
    recs.join(canon, recs("c_custkey") === canon("id"))
      .groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"),
        max(struct(col("c_acctbal"), col("c_custkey"))).as("rep"))
      .select(col("canonical_id"), col("cluster_size"),
        col("rep.c_custkey").as("rep_custkey"),
        col("rep.c_acctbal").as("rep_acctbal"))
  }

  private val q121Sql = {
    val pair = (i: Int) =>
      s"SELECT id AS id_a, id$i AS id_b FROM n WHERE id$i IS NOT NULL AND levenshtein(key, k$i) <= 1"
    s"""WITH RECURSIVE
         r AS (SELECT c_custkey AS id, c_name AS key, substr(c_name, 1, 14) AS blk
               FROM customer),
         n AS (SELECT id, key,
                 lead(id, 1) OVER w AS id1, lead(key, 1) OVER w AS k1,
                 lead(id, 2) OVER w AS id2, lead(key, 2) OVER w AS k2,
                 lead(id, 3) OVER w AS id3, lead(key, 3) OVER w AS k3
               FROM r WINDOW w AS (PARTITION BY blk ORDER BY key, id)),
         p AS (${pair(1)} UNION ALL ${pair(2)} UNION ALL ${pair(3)}),
         edges AS (SELECT id_a AS src, id_b AS dst FROM p
                   UNION SELECT id_b, id_a FROM p),
         reach(id, comp) AS (
           SELECT src, src FROM edges
           UNION
           SELECT e.src, r2.comp FROM edges e JOIN reach r2 ON e.dst = r2.id),
         comp AS (SELECT id, min(comp) AS canonical FROM reach GROUP BY id),
         lab AS (SELECT c.c_custkey, c.c_acctbal,
                        coalesce(m.canonical, c.c_custkey) AS canonical_id
                 FROM customer c LEFT JOIN comp m ON c.c_custkey = m.id),
         g AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size,
                      max(struct_pack(a := c_acctbal, k := c_custkey)) AS rep
               FROM lab GROUP BY 1)
       SELECT canonical_id, cluster_size, rep.k AS rep_custkey, rep.a AS rep_acctbal
       FROM g"""
  }

  /** q123 — time-series gap fill ([[GapFill.hourlyFfill]]): purchase
    * values resampled onto each user's hourly grid with forward fill —
    * the feature-store materialization shape. Bounded to 500 users so
    * the oracle result stays comparable; the operator itself is
    * key-partitioned end to end. `value` is a raw passthrough double
    * (no arithmetic), so it hash-pins without rounding. */
  private val q123: Q = (s, dir) =>
    GapFill.hourlyFfill(
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("user_id") < 500),
      "user_id", "ts", "value", "event_id")

  private val q123Sql =
    """WITH src AS (SELECT user_id AS key, date_trunc('hour', ts) AS hour, ts,
                      event_id, value AS v
                    FROM events
                    WHERE event_type = 'purchase' AND user_id < 500
                      AND value IS NOT NULL),
          obs AS (SELECT key, hour,
                    max(struct_pack(t := ts, e := event_id, v := v)).v AS obs_value
                  FROM src GROUP BY 1, 2),
          bounds AS (SELECT key, min(hour) AS h0, max(hour) AS h1 FROM obs GROUP BY 1),
          spine AS (SELECT key, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
                    FROM bounds),
          j AS (SELECT s.key, s.hour, o.obs_value FROM spine s
                LEFT JOIN obs o USING (key, hour))
       SELECT key, hour,
              last_value(obs_value IGNORE NULLS) OVER (PARTITION BY key ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
              obs_value IS NOT NULL AS observed
       FROM j"""

  val defs: Map[String, Q] = Map(
    "q123_gap_fill" -> q123,
    "q121_er_golden" -> q121,
    "q119_auc" -> q119,
    "q120_ks_drift" -> q120,
    "q118_hits" -> q118,
    "q115_sorted_neighborhood" -> q115,
    "q117_corr_matrix" -> q117,
    "q104_fuzzy_join" -> q104,
    "q106_rolling_median" -> q106,
    "q108_pareto_front" -> q108,
    "q110_percentile_norm" -> q110,
    "q112_kcore" -> q112,
    "q91_markov_transitions" -> q91,
    "q96_assoc_rules" -> q96,
    "q97_hll_distinct" -> q97,
    "q98_time_decay" -> q98,
    "q100_equidepth_hist" -> q100,
    "q92_mad_outliers" -> q92,
    "q71_asof_join"  -> q71,
    "q72_range_join" -> q72,
    "q73_khop_reach" -> q73,
    "q160_closure"   -> q160,
    "q74_pagerank"   -> q74,
    "q75_kmv_distinct" -> q75,
    "q76_quantiles"  -> q76,
    "q77_heavy_hitters" -> q77,
    "q78_weighted_sample" -> q78,
    "q79_triangles"  -> q79,
    "q80_neighbor_jaccard" -> q80,
    "q81_label_prop" -> q81)

  val oracles: Map[String, String] = Map(
    "q123_gap_fill" -> q123Sql,
    "q121_er_golden" -> q121Sql,
    "q119_auc" -> q119Sql,
    "q120_ks_drift" -> q120Sql,
    "q118_hits" -> q118Sql,
    "q115_sorted_neighborhood" -> q115Sql,
    "q117_corr_matrix" -> q117Sql,
    "q104_fuzzy_join" -> q104Sql,
    "q106_rolling_median" -> q106Sql,
    "q108_pareto_front" -> q108Sql,
    "q110_percentile_norm" -> q110Sql,
    "q112_kcore" -> q112Sql,
    "q91_markov_transitions" -> q91Sql,
    "q96_assoc_rules" -> q96Sql,
    "q97_hll_distinct" -> q97Sql,
    "q98_time_decay" -> q98Sql,
    "q100_equidepth_hist" -> q100Sql,
    "q92_mad_outliers" -> q92Sql,
    "q71_asof_join"  -> q71Sql,
    "q72_range_join" -> q72Sql,
    "q73_khop_reach" -> q73Sql,
    "q160_closure"   -> q160Sql,
    "q74_pagerank"   -> q74Sql,
    "q75_kmv_distinct" -> q75Sql,
    "q76_quantiles"  -> q76Sql,
    "q77_heavy_hitters" -> q77Sql,
    "q78_weighted_sample" -> q78Sql,
    "q79_triangles"  -> q79Sql,
    "q80_neighbor_jaccard" -> q80Sql,
    "q81_label_prop" -> q81Sql)
}
