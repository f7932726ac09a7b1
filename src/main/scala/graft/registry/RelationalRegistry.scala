package graft
package registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Relational coverage (SURVEY §2.2-2.8): filters, joins, aggregates, windows, set ops, scalar functions over the TPC-H-ish tables.
  *
  * One slice of the driver registry (see [[graft.SparkEntry]], which
  * composes all slices): entry text is verbatim from the pre-split
  * SparkEntry, so the oracle gate's evidence carries over unchanged.
  */
private[graft] object RelationalRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- relational coverage (SURVEY §2.2-2.8) ---
    "pricing_summary" -> ((s, d) => RelationalOps.pricingSummary(s, d)),
    "filter_project" -> ((s, d) => RelationalOps.filterProject(s, d)),
    "revenue_by_nation" -> ((s, d) => RelationalOps.revenueByNation(s, d)),
    "semi_join" -> ((s, d) => RelationalOps.semiJoin(s, d)),
    "anti_join" -> ((s, d) => RelationalOps.antiJoin(s, d)),
    "window_topn" -> ((s, d) => RelationalOps.windowTopN(s, d)),
    "window_running" -> ((s, d) => RelationalOps.windowRunning(s, d)),
    "global_topk" -> ((s, d) => RelationalOps.globalTopK(s, d)),
    "distinct_flags" -> ((s, d) => RelationalOps.distinctFlags(s, d)),
    "set_ops" -> ((s, d) => RelationalOps.setOps(s, d)),
    "rollup_customers" -> ((s, d) => RelationalOps.rollupCustomers(s, d)),
    "json_extract" -> ((s, d) => RelationalOps.jsonExtract(s, d)),
    "events_hourly" -> ((s, d) => RelationalOps.eventsHourly(s, d)),
    "user_sessions" -> ((s, d) => RelationalOps.userSessions(s, d)),
    "asof_join" -> ((s, d) => RelationalOps.asofJoin(s, d)),
    "interval_join" -> ((s, d) => RelationalOps.intervalJoinCounts(s, d)),
    "events_rolling" -> ((s, d) => RelationalOps.eventsRolling(s, d)),
    "events_hourly_dense" -> ((s, d) => RelationalOps.eventsHourlyDense(s, d)),
    "events_hopping" -> ((s, d) => RelationalOps.eventsHopping(s, d)),
    "grouping_sets_docs" -> ((s, d) => RelationalOps.docsGroupingSets(s, d)),
    "user_conversion" -> ((s, d) => RelationalOps.userConversion(s, d)),
    // weekly retention matrix: cohort = ISO week of first activity,
    // counted per active-week offset — all partial-aggregable shuffles
    "retention_cohorts" -> ((s, d) => RelationalOps.retentionCohorts(s, d)),
    "cube_events" -> ((s, d) => RelationalOps.cubeEvents(s, d)),
    // cube over a NULLABLE dimension: grouping_id() disambiguates the
    // NULL group from the aggregated-out marker
    "cube_events_gid" -> ((s, d) => RelationalOps.cubeEventsGid(s, d)),
    // TPC-H Q21 shape: semi + anti self-join on lineitem, equi-keyed
    "late_sole_suppliers" -> ((s, d) => RelationalOps.lateSoleSuppliers(s, d)),
    // zero-Exchange co-located join over bucketed tables (plan-asserted
    // in BucketedQuerySpec)
    "bucketed_customer_orders" -> ((s, d) => RelationalOps.bucketedCustomerOrders(s, d)),
    // salted join over a 90%-hot derived key (plan-asserted in
    // ScaleToolsSpec; the oracle states the join unsalted)
    "salted_events_join" -> ((s, d) => SkewTools.saltedEventsJoin(s, d)),
    "correlation_stats" -> ((s, d) => RelationalOps.correlationStats(s, d)),
    "value_deciles" -> ((s, d) => RelationalOps.valueDeciles(s, d)),
    "min_cost_supplier" -> ((s, d) => RelationalOps.minCostSupplier(s, d)),
    "shipping_priority" -> ((s, d) => RelationalOps.shippingPriority(s, d)),
    "late_priority_orders" -> ((s, d) => RelationalOps.latePriorityOrders(s, d)),
    "promo_revenue" -> ((s, d) => RelationalOps.promoRevenue(s, d)),
    "small_qty_revenue" -> ((s, d) => RelationalOps.smallQtyRevenue(s, d)),
    "big_orders" -> ((s, d) => RelationalOps.bigOrders(s, d)),
    "value_ranks" -> ((s, d) => RelationalOps.valueRanks(s, d)),
    "events_pivot" -> ((s, d) => RelationalOps.eventsPivot(s, d)),
    "value_percentiles" -> ((s, d) => RelationalOps.valuePercentiles(s, d)),
    // sketch twin: mergeable GK sketches. The estimates are engine-
    // specific, but GK's rank guarantee is deterministic, so the
    // registered projection keeps the exact columns plus the
    // self-audited per-quantile bound flags the oracle states TRUE
    // (vocab_cms pattern); the raw estimates stay in the operator frame
    "value_percentiles_approx" -> ((s, d) =>
      RelationalOps.valuePercentilesApprox(s, d)
        .select("event_type", "n", "gk_ok_p50", "gk_ok_p90", "gk_ok_p99")),
  )

  val oracles: Map[String, String] = Map(

    "pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
        |  AND l_discount > 0.08 AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  LAG(o_orderkey, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "set_ops" ->
      """SELECT o_custkey FROM (
        |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |   INTERSECT
        |   SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P') t
        |ORDER BY o_custkey""".stripMargin,
    "rollup_customers" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // the oracle states the skewed join UNSALTED — salting must be
    // value-invariant, that is the whole contract
    "salted_events_join" ->
      """SELECT n.n_name,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN nation n
        |  ON (CASE WHEN e.user_id % 100 < 90 THEN 0
        |           ELSE e.user_id % 25 END) = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,
    // round(6) is exact here (2-decimal values x <=2-decimal
    // interpolation fraction -> <=4-decimal true quantile); it absorbs
    // the engines' 1-ulp interpolation-order difference (r9 sf0.5 catch)
    "value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // GK's rank guarantee is deterministic (not probabilistic), so the
    // audited bound flags are literal TRUE; event_type and n are exact
    "value_percentiles_approx" ->
      """SELECT event_type, COUNT(*) AS n,
        |  TRUE AS gk_ok_p50, TRUE AS gk_ok_p90, TRUE AS gk_ok_p99
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // latest order per (customer, <= ts), max-orderkey tiebreak — the
    // as-of join's point-lookup formulation.
    "asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT o.o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_orderkey
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,
    // the oracle states the interval join declaratively (inequality
    // join); the engine computes it as a bucketed equi-join — results
    // must agree exactly
    "interval_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts AS cts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.event_id, count(*) AS n
        |  FROM clicks c JOIN purchases p
        |    ON c.user_id = p.user_id
        |   AND p.pts > c.cts AND p.pts <= c.cts + INTERVAL 1 HOUR
        |  GROUP BY c.event_id)
        |SELECT c.event_id, coalesce(j.n, 0)::BIGINT AS n_purchases_1h
        |FROM clicks c LEFT JOIN j USING (event_id)
        |ORDER BY event_id""".stripMargin,
    // RANGE frame mirrored on epoch micros; decimal-summed values
    "events_rolling" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_value_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // Q2-flavored correlated-min as a window; per-row division then
    // MIN is accumulation-order-free
    "min_cost_supplier" ->
      """WITH best AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS best_price
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |r AS (
        |  SELECT l_partkey, l_suppkey, best_price,
        |    row_number() OVER (PARTITION BY l_partkey
        |                       ORDER BY best_price, l_suppkey) AS rn
        |  FROM best)
        |SELECT p.p_partkey, p.p_size, s.s_suppkey, s.s_name, n.n_name,
        |  r.best_price
        |FROM r
        |JOIN part p ON r.l_partkey = p.p_partkey AND p.p_size < 10
        |JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE r.rn = 1
        |ORDER BY p.p_partkey""".stripMargin,
    // Q3-shaped unshipped-revenue top-N (decimal revenue, total-order
    // tiebreak on the orderkey)
    "shipping_priority" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    // Q4-shaped (restated on this schema: shipped >30 days after the
    // order date stands in for commit<receipt)
    "late_priority_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // Q14-shaped: CASE without ELSE ≡ Spark sum(when(...)) null-skip;
    // the pct is one double multiply+divide on identical operands
    "promo_revenue" ->
      """WITH x AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(1 - l_discount AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT promo_revenue, total_revenue,
        |  100.0 * promo_revenue / total_revenue AS promo_pct
        |FROM x""".stripMargin,
    // Q17-shaped: the 0.2·avg threshold restated multiplicatively
    // (5·qty·cnt < Σqty) keeps the predicate in exact arithmetic
    "small_qty_revenue" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN pp ON l.l_partkey = pp.l_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * pp.cnt * 5 < pp.sum_qty""".stripMargin,
    // Q18-shaped: HAVING on the exact decimal quantity sum; detail
    // joins after the reduction
    "big_orders" ->
      """WITH heavy AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
        |FROM heavy
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    // rank-ratio windows over a total order: identical doubles in any
    // engine (rank arithmetic, not accumulation)
    "value_ranks" ->
      """WITH r AS (
        |  SELECT event_type, event_id, value,
        |    percent_rank() OVER (PARTITION BY event_type
        |                         ORDER BY value, event_id) AS pct_rank,
        |    cume_dist() OVER (PARTITION BY event_type
        |                      ORDER BY value, event_id) AS cume
        |  FROM events)
        |SELECT event_type, event_id, value, pct_rank, cume
        |FROM r WHERE pct_rank >= 0.99
        |ORDER BY event_type, event_id""".stripMargin,
    // NTILE with a total-order tiebreak -> engine-exact deciles
    "value_deciles" ->
      """WITH d AS (
        |  SELECT event_type, value,
        |    ntile(10) OVER (PARTITION BY event_type
        |                    ORDER BY value, event_id) AS decile
        |  FROM events)
        |SELECT event_type, decile::BIGINT AS decile, COUNT(*) AS n,
        |  min(value) AS lo, max(value) AS hi
        |FROM d GROUP BY event_type, decile
        |ORDER BY event_type, decile""".stripMargin,
    // bivariate moments rounded to 6 (Welford-vs-naive accumulators)
    "correlation_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp,
        |  round(stddev_samp(l_quantity), 6) AS std_q,
        |  round(stddev_samp(l_extendedprice), 6) AS std_p,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // CUBE: hour() matches because both engines read the event ts in
    // UTC; NULL-first ordering mirrors Spark's asc_nulls_first
    "cube_events" ->
      """SELECT event_type, extract(hour FROM ts)::BIGINT AS hod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY CUBE (event_type, hod)
        |ORDER BY event_type NULLS FIRST, hod NULLS FIRST""".stripMargin,
    // CUBE with grouping_id over a nullable dimension: Spark's
    // grouping_id() bit order (left dim = high bit) restated as
    // GROUPING(etype)*2 + GROUPING(hod); NULLS FIRST mirrors
    // asc_nulls_first, and gid leads the sort so the NULL-value group
    // and the rolled-up marker rows order identically in both engines
    "cube_events_gid" ->
      """WITH src AS (
        |  SELECT nullif(event_type, 'view') AS etype,
        |         extract(hour FROM ts)::BIGINT AS hod, value
        |  FROM events)
        |SELECT (GROUPING(etype)*2 + GROUPING(hod))::BIGINT AS gid,
        |  etype, hod, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM src
        |GROUP BY CUBE (etype, hod)
        |ORDER BY gid, etype NULLS FIRST, hod NULLS FIRST""".stripMargin,
    // Q21 shape: EXISTS/NOT EXISTS as correlated subqueries; "late" is
    // restated as a returned line (this schema has no receipt/commit
    // dates)
    "late_sole_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 25""".stripMargin,
    // bucketed co-located join: values are layout-independent, so the
    // oracle is the plain join+agg
    "bucketed_customer_orders" ->
      """SELECT c_custkey, c_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    // dense grid via generate_series; zero-filled cells
    "events_hourly_dense" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1 FROM events),
        |grid AS (
        |  SELECT strftime(g.h, '%Y-%m-%d %H') AS hour, t.event_type
        |  FROM (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b) g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
        |actual AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT g.hour, g.event_type,
        |  coalesce(a.n, 0)::BIGINT AS n,
        |  coalesce(a.sum_value, 0.0) AS sum_value
        |FROM grid g LEFT JOIN actual a USING (hour, event_type)
        |ORDER BY hour, event_type""".stripMargin,
    "events_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
        |FROM events GROUP BY 1 ORDER BY hour""".stripMargin,
    // weekly retention matrix: ISO-Monday week truncation and exact
    // week offsets agree across engines
    "retention_cohorts" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cw
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
        |SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
        |  date_diff('week', f.cw, a.week)::BIGINT AS offset_weeks,
        |  count(*)::BIGINT AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY f.cw, offset_weeks
        |ORDER BY cohort_week, offset_weeks""".stripMargin,
    // gaps-and-islands replay of session_window: break when the gap to
    // the previous event is >= 30 min (Spark session is [start, last+gap)).
    "user_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM m)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s
        |GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,
    // cogroup funnel: first-click anchoring restated as SQL aggregates;
    // exact epoch-micros arithmetic end to end
    "user_conversion" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_clicks, min(epoch_us(ts)) AS first_click
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |p AS (
        |  SELECT user_id, count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |f AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS first_conv
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.first_click
        |  GROUP BY e.user_id)
        |SELECT c.user_id, c.n_clicks,
        |  coalesce(p.n_purchases, 0) AS n_purchases,
        |  f.first_conv - c.first_click AS conv_latency_us
        |FROM c
        |LEFT JOIN p ON c.user_id = p.user_id
        |LEFT JOIN f ON c.user_id = f.user_id
        |ORDER BY c.user_id""".stripMargin,
    // GROUPING SETS marginals; NULLS FIRST mirrored (Spark asc default)
    "grouping_sets_docs" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE length(trim(text)) > 0
        |GROUP BY GROUPING SETS ((lang), (source), ())
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    // hopping windows: every event lands in exactly size/slide = 4
    // windows; the cross join against range(4) reconstructs them
    "events_hopping" ->
      """SELECT strftime(to_timestamp(floor(epoch(ts) / 900) * 900)
        |          - k.range * INTERVAL 15 MINUTE, '%Y-%m-%d %H:%M') AS w_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events, range(4) k
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
  )
}
