package graft.queries

import graft.{Q, Tables}
import graft.ops.RelationalOps
import graft.ops.Determinism.{sqlExactAvg, sqlExactSum}
import org.apache.spark.sql.functions._

/** Warehouse-analytics queries over the star schema — the engine families
  * the reference pushes into Postgres (E3), widened per SURVEY.md §2.4-2.8.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // Grouped multi-aggregate scan (TPC-H Q1 shape).
    Q("q1_pricing_summary",
      (s, dir) => RelationalOps.pricingSummary(Tables.lineitem(s, dir))
        .orderBy("l_returnflag", "l_linestatus"),
      s"""SELECT l_returnflag, l_linestatus,
         |${sqlExactSum("l_quantity")} AS sum_qty,
         |${sqlExactSum("l_extendedprice")} AS sum_base_price,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |${sqlExactAvg("l_quantity")} AS avg_qty,
         |count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin.replace("\n", " ")),

    // Multi-hop dimension join (lineitem→orders→customer→nation).
    Q("revenue_by_nation",
      (s, dir) => RelationalOps.revenueByNation(
          Tables.lineitem(s, dir), Tables.orders(s, dir),
          Tables.customer(s, dir), Tables.nation(s, dir))
        .orderBy("n_name"),
      s"""SELECT n_name,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " ")),

    // TPC-H Q3 shape: 3-table join with pushed-down date/segment
    // filters, per-order revenue, deterministic top-10.
    Q("q3_shipping_priority",
      (s, dir) => RelationalOps.shippingPriority(
        Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir), "BUILDING", "1995-03-15", 10),
      s"""SELECT l_orderkey, o_orderdate,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |CAST(count(*) AS BIGINT) AS n_items
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |AND o_orderdate < DATE '1995-03-15'
         |AND l_shipdate > DATE '1995-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q5 shape: the 6-table join with the customer-and-supplier-
    // in-the-same-nation co-location constraint, region filter, date
    // window. The hardest join topology in the registry — exercises
    // hand-shaped join order (region nations pruned first, broadcast
    // into both dim sides) with only the two fact-key joins shuffling.
    Q("q5_local_supplier_volume",
      (s, dir) => RelationalOps.localSupplierVolume(
          Tables.lineitem(s, dir), Tables.orders(s, dir),
          Tables.customer(s, dir), Tables.supplier(s, dir),
          Tables.nation(s, dir), Tables.region(s, dir),
          "ASIA", "1996-01-01", "1997-01-01")
        .orderBy("n_name"),
      s"""SELECT n_name,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |AND o_orderdate >= DATE '1996-01-01'
         |AND o_orderdate < DATE '1997-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " ")),

    // TPC-H Q4 shape: correlated EXISTS — orders with at least one late
    // lineitem, counted per priority. Decorrelated to a LEFT SEMI join
    // with the cross-table lateness predicate in the join condition.
    Q("q4_order_priority",
      (s, dir) => RelationalOps.latePriorityOrders(
          Tables.orders(s, dir), Tables.lineitem(s, dir),
          "1996-07-01", "1996-10-01", 60)
        .orderBy("o_orderpriority"),
      s"""SELECT o_orderpriority, count(*) AS order_count
         |FROM orders o
         |WHERE o_orderdate >= DATE '1996-07-01'
         |AND o_orderdate < DATE '1996-10-01'
         |AND EXISTS (SELECT 1 FROM lineitem l
         |  WHERE l.l_orderkey = o.o_orderkey
         |  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin.replace("\n", " ")),

    // TPC-H Q6 shape: the pure pushdown probe — all four predicates
    // reach the parquet scan, one partial-sum aggregate, zero joins.
    Q("q6_forecast_revenue",
      (s, dir) => RelationalOps.forecastRevenue(Tables.lineitem(s, dir),
        "1996-01-01", "1997-01-01", 0.05, 0.07, 24.0),
      s"""SELECT ${sqlExactSum("l_extendedprice * l_discount")} AS revenue,
         |count(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= DATE '1996-01-01'
         |AND l_shipdate < DATE '1997-01-01'
         |AND l_discount >= 0.05 AND l_discount <= 0.07
         |AND l_quantity < 24""".stripMargin.replace("\n", " ")),

    // TPC-H Q10 shape: one quarter's RETURNED items → top-20 customers
    // by lost revenue; facts shuffle once on the order key, dims
    // broadcast, top-k via TakeOrderedAndProject.
    Q("q10_returned_items",
      (s, dir) => RelationalOps.returnedItemReport(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), Tables.nation(s, dir),
        "1996-01-01", "1996-04-01", 20),
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |AND o_orderdate >= DATE '1996-01-01'
         |AND o_orderdate < DATE '1996-04-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20"""
        .stripMargin.replace("\n", " ")),

    // Data-quality expectation suite (the dbt-test / DLT-expectations
    // operator family): one row per declared expectation with violation
    // and checked counts — nullability, value ranges, key uniqueness,
    // referential integrity, accepted-value sets, freshness window.
    // Each check is a single aggregate over its table (uniqueness =
    // count minus distinct; referential integrity = a left join against
    // the DISTINCT parent keys and a null count); the report is a
    // 6-row union. At 100 TB each check stays one scan + one tiny agg,
    // and the checks share no state, so they parallelize trivially.
    Q("dq_expectations",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val orders = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir)
        val cust = Tables.customer(s, dir)
        def report(name: String, agged: org.apache.spark.sql.DataFrame) =
          agged.select(lit(name).as("check_name"),
            col("n_violations").cast("long").as("n_violations"),
            col("n_checked").cast("long").as("n_checked"),
            (col("n_violations") === 0).cast("int").as("pass"))
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY")
        val checks = Seq(
          report("events_ts_in_window", ev.agg(
            sum(when(col("ts") < lit("2024-01-01") ||
              col("ts") >= lit("2024-02-01"), 1L).otherwise(0L))
              .as("n_violations"),
            count(lit(1)).as("n_checked"))),
          report("events_user_id_not_null", ev.agg(
            sum(when(col("user_id").isNull, 1L).otherwise(0L))
              .as("n_violations"),
            count(lit(1)).as("n_checked"))),
          report("events_value_non_negative", ev.agg(
            sum(when(col("value") < 0, 1L).otherwise(0L))
              .as("n_violations"),
            count(col("value")).as("n_checked"))),
          report("orders_key_unique", orders.agg(
            (count(lit(1)) - countDistinct(col("o_orderkey")))
              .as("n_violations"),
            count(lit(1)).as("n_checked"))),
          report("lineitem_orderkey_in_orders", li
            .select(col("l_orderkey"))
            .join(orders.select(col("o_orderkey")).distinct(),
              col("l_orderkey") === col("o_orderkey"), "left")
            .agg(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
              .as("n_violations"),
              count(lit(1)).as("n_checked"))),
          report("customer_segment_accepted", cust.agg(
            sum(when(!col("c_mktsegment").isin(segs: _*), 1L)
              .otherwise(0L)).as("n_violations"),
            count(lit(1)).as("n_checked"))))
        checks.reduce(_ unionByName _).orderBy("check_name")
      },
      s"""SELECT check_name, n_violations, n_checked,
         |CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS pass
         |FROM (
         |SELECT 'events_ts_in_window' AS check_name,
         |  CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01'
         |    OR ts >= TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violations,
         |  CAST(count(*) AS BIGINT) AS n_checked FROM events
         |UNION ALL SELECT 'events_user_id_not_null',
         |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(*) AS BIGINT) FROM events
         |UNION ALL SELECT 'events_value_non_negative',
         |  CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(value) AS BIGINT) FROM events
         |UNION ALL SELECT 'orders_key_unique',
         |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
         |  CAST(count(*) AS BIGINT) FROM orders
         |UNION ALL SELECT 'lineitem_orderkey_in_orders',
         |  CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(*) AS BIGINT)
         |  FROM lineitem l LEFT JOIN
         |  (SELECT DISTINCT o_orderkey FROM orders) o
         |  ON l.l_orderkey = o.o_orderkey
         |UNION ALL SELECT 'customer_segment_accepted',
         |  CAST(SUM(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING',
         |    'FURNITURE', 'HOUSEHOLD', 'MACHINERY') THEN 1 ELSE 0 END)
         |    AS BIGINT),
         |  CAST(count(*) AS BIGINT) FROM customer) u
         |ORDER BY check_name""".stripMargin.replace("\n", " ")),

    // Top-k by aggregate (sort/limit; plans as TakeOrderedAndProject).
    Q("top_customers",
      (s, dir) => RelationalOps.topCustomers(
          Tables.orders(s, dir), Tables.customer(s, dir), 10),
      s"""SELECT c_custkey, c_name, total_spend, n_orders FROM (
         |SELECT o_custkey, ${sqlExactSum("o_totalprice")} AS total_spend,
         |count(*) AS n_orders FROM orders GROUP BY o_custkey) a
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY total_spend DESC, c_custkey ASC LIMIT 10"""
        .stripMargin.replace("\n", " ")),

    // NTILE decile report over customer spend. The window input is the
    // per-customer AGGREGATE (|customers| rows, not |orders|) — the same
    // bounded-relation class as every final orderBy; at 100 TB the exact
    // ntile swaps for approx_percentile bucket boundaries without
    // changing the output contract. Unique o_custkey tiebreak keeps the
    // decile cut deterministic on both engines.
    Q("customer_deciles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(graft.ops.Determinism.exactSum(col("o_totalprice"))
            .as("total_spend"))
        val w = Window.orderBy(col("total_spend").desc, col("o_custkey").asc)
        spend.withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_customers"),
            graft.ops.Determinism.exactSum(col("total_spend"))
              .as("decile_spend"),
            min(col("total_spend")).as("min_spend"),
            max(col("total_spend")).as("max_spend"))
          .orderBy("decile")
      },
      s"""WITH spend AS (
         |  SELECT o_custkey, ${sqlExactSum("o_totalprice")} AS total_spend
         |  FROM orders GROUP BY o_custkey),
         |d AS (SELECT *, CAST(ntile(10) OVER (ORDER BY total_spend DESC,
         |  o_custkey) AS BIGINT) AS decile FROM spend)
         |SELECT decile, count(*) AS n_customers,
         |${sqlExactSum("total_spend")} AS decile_spend,
         |min(total_spend) AS min_spend, max(total_spend) AS max_spend
         |FROM d GROUP BY decile ORDER BY decile"""
        .stripMargin.replace("\n", " ")),

    // Grouping sets: ROLLUP over status × priority.
    Q("orders_rollup",
      (s, dir) => RelationalOps.ordersRollup(Tables.orders(s, dir))
        .orderBy("o_orderstatus", "o_orderpriority"),
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
         |${sqlExactSum("o_totalprice")} AS total_price
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin.replace("\n", " ")),

    // Distinct aggregates per group (exact; the HLL path is benched
    // separately — approx results can't hash-match an oracle).
    Q("order_stats",
      (s, dir) => RelationalOps.orderStats(Tables.lineitem(s, dir))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        |count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin.replace("\n", " ")),

    // Set operation: EXCEPT on distinct key sets.
    Q("custkeys_except",
      (s, dir) => RelationalOps.custkeysExcept(Tables.orders(s, dir))
        .orderBy("o_custkey"),
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin.replace("\n", " ")),

    // TPC-H Q2 shape: min-cost supplier per filtered part (the fixture
    // has no partsupp, so lineitem is the price evidence). Correlated-
    // MIN decorrelated to one composite-key aggregate + a window over
    // the aggregate. Unit price is computed in integer micro-units
    // (round at scale 0 — the one rounding scale where the .5 boundary
    // is binary-representable, hence engine-portable) before the min,
    // so argmin ties break identically in both engines.
    Q("q2_min_cost_supplier",
      (s, dir) => RelationalOps.minCostSupplier(
          Tables.lineitem(s, dir), Tables.part(s, dir),
          Tables.supplier(s, dir), Tables.nation(s, dir), "PROMO", 5)
        .orderBy("p_partkey"),
      """WITH per_supp AS (
        |  SELECT p_partkey, p_name, l_suppkey,
        |  min(round(l_extendedprice * 1000000.0 / l_quantity, 0)
        |    / 1000000.0) AS min_unit_price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO' AND p_size <= 5
        |  GROUP BY 1, 2, 3),
        |win AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
        |  ORDER BY min_unit_price ASC, l_suppkey ASC) AS rn FROM per_supp)
        |SELECT p_partkey, p_name, s_suppkey, s_name, n_name, min_unit_price
        |FROM win JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE rn = 1 ORDER BY p_partkey""".stripMargin.replace("\n", " ")),

    // TPC-H Q12 shape: CASE-split priority counts per line status
    // inside a ship-date window (the fixture has no l_shipmode; the
    // classifying dimension is l_linestatus).
    Q("q12_priority_class",
      (s, dir) => RelationalOps.priorityByLinestatus(
          Tables.lineitem(s, dir), Tables.orders(s, dir),
          "1996-01-01", "1997-01-01")
        .select(col("l_linestatus"),
          col("high_line_count").cast("long").as("high_line_count"),
          col("low_line_count").cast("long").as("low_line_count"))
        .orderBy("l_linestatus"),
      """SELECT l_linestatus,
        |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1996-01-01'
        |AND l_shipdate < DATE '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q14 shape: promotion revenue share of one ship-date month —
    // a conditional aggregate over a broadcast part join, reduced to a
    // single-row ratio.
    Q("q14_promo_revenue",
      (s, dir) => RelationalOps.promoRevenueShare(
        Tables.lineitem(s, dir), Tables.part(s, dir),
        "1996-09-01", "1996-10-01"),
      s"""SELECT
         |${sqlExactSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS promo_revenue,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS total_revenue,
         |round(100.0 * ${sqlExactSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} /
         |  ${sqlExactSum("l_extendedprice * (1 - l_discount)")}, 6) AS promo_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= DATE '1996-09-01'
         |AND l_shipdate < DATE '1996-10-01'""".stripMargin.replace("\n", " ")),

    // TPC-H Q18 shape: large-volume orders (HAVING over a fact
    // aggregate) joined back to orders + customer, top-100 by value.
    Q("q18_large_volume",
      (s, dir) => RelationalOps.largeVolumeOrders(
        Tables.lineitem(s, dir), Tables.orders(s, dir),
        Tables.customer(s, dir), 170.0, 100),
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         |sum_qty FROM (
         |  SELECT l_orderkey, ${sqlExactSum("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey) q
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE sum_qty > 170
         |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q19 shape: disjunctive (brand × size-range × quantity-range)
    // predicate join, per-brand revenue. Spark side pre-derives each
    // join side's predicate superset so both scans prune before the
    // broadcast join; the oracle states the plain disjunction — the
    // superset rewrite is a pure optimization, same rows.
    Q("q19_disjunctive_filter",
      (s, dir) => RelationalOps.disjunctiveBrandRevenue(
          Tables.lineitem(s, dir), Tables.part(s, dir),
          Seq(("Brand#1", (1, 10), (1.0, 20.0)),
            ("Brand#2", (11, 20), (10.0, 30.0)),
            ("Brand#3", (21, 30), (20.0, 40.0))))
        .orderBy("p_brand"),
      s"""SELECT p_brand,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS revenue,
         |count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 1 AND 20)
         |OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
         |    AND l_quantity BETWEEN 10 AND 30)
         |OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30
         |    AND l_quantity BETWEEN 20 AND 40)
         |GROUP BY p_brand ORDER BY p_brand"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q13 shape: left-outer count with ZERO-groups kept (the
    // distribution of customers by order count, where never-ordered
    // customers form the c_count=0 row an inner join would drop). The
    // oracle states the LEFT JOIN with the filter in the ON clause; the
    // Spark side decorrelates into fact-side pre-aggregate + left join +
    // coalesce(0) — see RelationalOps.customerOrderDistribution.
    Q("q13_customer_distribution",
      (s, dir) => RelationalOps.customerOrderDistribution(
          Tables.customer(s, dir), Tables.orders(s, dir),
          Seq("1-URGENT", "2-HIGH"))
        .orderBy(desc("custdist"), desc("c_count")),
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey
        |  AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q17 shape: correlated scalar avg ×0.2 — revenue lost to
    // small-quantity lines where "small" is relative to the part's own
    // average. Oracle states the correlated subquery; Spark decorrelates
    // into a per-part threshold aggregate broadcast back into one fact
    // pass (RelationalOps.smallQuantityRevenue). Threshold arithmetic is
    // exactAvg on both sides so the strict < can't flip on a last ulp.
    Q("q17_small_quantity_revenue",
      (s, dir) => RelationalOps.smallQuantityRevenue(
        Tables.lineitem(s, dir), Tables.part(s, dir), "Brand#1", 0.2),
      s"""SELECT ${sqlExactSum("l1.l_extendedprice")} / 7.0 AS avg_yearly,
         |CAST(count(*) AS BIGINT) AS n_small
         |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
         |WHERE p_brand = 'Brand#1'
         |AND l1.l_quantity < (
         |  SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,6)))
         |    AS DOUBLE) / COUNT(l2.l_quantity))
         |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q21 shape: double-correlated EXISTS / NOT-EXISTS against the
    // same fact — suppliers who were the SOLE late supplier on a
    // finished multi-supplier order ("late" = shipped >60 days after
    // order date; the fixture has no receipt/commit dates). Oracle
    // states both correlated subqueries; Spark decorrelates into ONE
    // orderkey-partitioned per-order profile reused for both
    // (RelationalOps.waitingSuppliers).
    Q("q21_waiting_suppliers",
      (s, dir) => RelationalOps.waitingSuppliers(
          Tables.supplier(s, dir), Tables.lineitem(s, dir),
          Tables.orders(s, dir), Tables.nation(s, dir), "NATION_19", 60)
        .orderBy(desc("numwait"), col("s_name")),
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |AND o_orderstatus = 'F'
        |AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |AND EXISTS (SELECT 1 FROM lineitem l2
        |  WHERE l2.l_orderkey = l1.l_orderkey
        |  AND l2.l_suppkey <> l1.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |  WHERE l3.l_orderkey = l1.l_orderkey
        |  AND l3.l_suppkey <> l1.l_suppkey
        |  AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |AND s_nationkey = n_nationkey AND n_name = 'NATION_19'
        |GROUP BY s_name ORDER BY numwait DESC, s_name"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q22 shape: NOT-EXISTS anti-join + uncorrelated scalar
    // subquery + substring grouping — high-balance customers (above the
    // positive-balance average of their code cohort) with no order since
    // 2000, grouped by a 2-char code cut from the customer name (the
    // fixture's phone-prefix analogue). Oracle states the scalar
    // subquery and NOT EXISTS; Spark broadcasts the 1-row avg and
    // left-anti-joins the date-filtered order keys
    // (RelationalOps.dormantHighValueCustomers).
    Q("q22_dormant_customers",
      (s, dir) => RelationalOps.dormantHighValueCustomers(
          Tables.customer(s, dir), Tables.orders(s, dir),
          Seq("01", "13", "25", "37", "49", "62", "74", "86", "98"),
          "2000-01-01")
        .orderBy("cntrycode"),
      s"""WITH sel AS (
         |  SELECT substring(c_name, 16, 2) AS cntrycode, c_acctbal,
         |  c_custkey FROM customer
         |  WHERE substring(c_name, 16, 2) IN
         |  ('01','13','25','37','49','62','74','86','98'))
         |SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
         |${sqlExactSum("c_acctbal")} AS totacctbal
         |FROM sel
         |WHERE c_acctbal > (
         |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
         |    / COUNT(c_acctbal)
         |  FROM sel WHERE c_acctbal > 0.0)
         |AND NOT EXISTS (SELECT 1 FROM orders
         |  WHERE o_custkey = c_custkey
         |  AND o_orderdate >= DATE '2000-01-01')
         |GROUP BY cntrycode ORDER BY cntrycode"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q11 shape: HAVING against a global scalar (uncorrelated
    // subquery) — parts whose revenue clears 1.5× the average per-part
    // revenue (scale-free where TPC-H's constant is 0.0001/SF). The
    // 1-row global aggregate broadcast-crosses into the filter.
    Q("q11_important_parts",
      (s, dir) => RelationalOps.importantParts(Tables.lineitem(s, dir), 1.5)
        .orderBy(desc("value"), col("l_partkey")),
      s"""SELECT l_partkey,
         |${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS value
         |FROM lineitem GROUP BY l_partkey
         |HAVING ${sqlExactSum("l_extendedprice * (1 - l_discount)")} > (
         |  SELECT 1.5 * ${sqlExactSum("l_extendedprice * (1 - l_discount)")}
         |    / COUNT(DISTINCT l_partkey) FROM lineitem)
         |ORDER BY value DESC, l_partkey"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q15 shape: argmax against an aggregated view — the
    // supplier(s) whose Q1-1996 revenue equals the view's max (scalar
    // subquery over the same aggregate; exact decimal sums make the
    // double equality engine-portable).
    Q("q15_top_supplier",
      (s, dir) => RelationalOps.topRevenueSupplier(
          Tables.lineitem(s, dir), Tables.supplier(s, dir),
          "1996-01-01", "1996-04-01")
        .orderBy("s_suppkey"),
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |  ${sqlExactSum("l_extendedprice * (1 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin.replace("\n", " ")),

    // TPC-H Q16 shape: NOT-IN exclusion + distinct-count per attribute
    // triple — negative-balance suppliers (the complaints stand-in)
    // excluded via left_anti, then count(DISTINCT supplier) per
    // (brand, type, size) over a brand/size-filtered part set.
    Q("q16_supplier_count",
      (s, dir) => RelationalOps.supplierCountByPartAttrs(
          Tables.lineitem(s, dir), Tables.part(s, dir),
          Tables.supplier(s, dir), "Brand#1", Seq(1, 5, 9, 13))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size")),
      """SELECT p_brand, p_type, p_size,
        |CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13)
        |AND l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
        .stripMargin.replace("\n", " ")),

    // TPC-H Q20 shape: IN-membership over a correlated agg-vs-agg
    // threshold — suppliers whose 1996 PROMO quantity exceeds 15% of
    // their total 1996 quantity (the available-stock comparison
    // re-keyed; the fixture has no partsupp). The oracle states the
    // IN + HAVING form; Spark collapses both correlated sums into one
    // conditional aggregate and semi-joins the qualifying keys.
    Q("q20_promo_heavy_suppliers",
      (s, dir) => RelationalOps.promoHeavySuppliers(
          Tables.lineitem(s, dir), Tables.part(s, dir),
          Tables.supplier(s, dir), "1996-01-01", "1997-01-01", 0.15)
        .orderBy("s_suppkey"),
      s"""SELECT s_suppkey, s_name FROM supplier
         |WHERE s_suppkey IN (
         |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1997-01-01'
         |  GROUP BY l_suppkey
         |  HAVING ${sqlExactSum(
             "CASE WHEN p_type = 'PROMO' THEN l_quantity ELSE 0.0 END")}
         |  > 0.15 * ${sqlExactSum("l_quantity")})
         |ORDER BY s_suppkey""".stripMargin.replace("\n", " ")),

    // Snapshot diff — the table-versioning audit (Delta/Iceberg
    // time-travel's "what changed" query as an explicit operator):
    // v2 is derived from orders by a deterministic mutation script
    // (drop keys ≡0 mod 101, bump totalprice on keys ≡0 mod 97, insert
    // shifted copies of keys ≡0 mod 103), and the diff is one
    // full-outer join on the key with null-safe struct payload
    // comparison, reduced to per-change-type counts. Both engines
    // derive v2 AND diff it independently — the hash match proves the
    // whole versioning round trip.
    Q("table_diff",
      (s, dir) => {
        val v1 = Tables.orders(s, dir)
        val changed = v1.filter(col("o_orderkey") % 101 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
        val added = v1.filter(col("o_orderkey") % 103 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)
        RelationalOps.snapshotDiff(
            v1, changed.unionByName(added), "o_orderkey")
          .select(col("change_type"),
            col("n_rows").cast("long").as("n_rows"))
          .orderBy("change_type")
      },
      """WITH v2 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
        |    ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 101 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 103 = 0)
        |SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows FROM (
        |  SELECT CASE
        |  WHEN v1.o_orderkey IS NULL THEN 'added'
        |  WHEN v2.o_orderkey IS NULL THEN 'removed'
        |  WHEN NOT (v1.o_custkey IS NOT DISTINCT FROM v2.o_custkey
        |    AND v1.o_orderstatus IS NOT DISTINCT FROM v2.o_orderstatus
        |    AND v1.o_totalprice IS NOT DISTINCT FROM v2.o_totalprice
        |    AND v1.o_orderdate IS NOT DISTINCT FROM v2.o_orderdate
        |    AND v1.o_orderpriority IS NOT DISTINCT FROM v2.o_orderpriority)
        |    THEN 'changed'
        |  ELSE 'unchanged' END AS change_type
        |  FROM orders v1 FULL OUTER JOIN v2
        |  ON v1.o_orderkey = v2.o_orderkey)
        |GROUP BY change_type ORDER BY change_type"""
        .stripMargin.replace("\n", " ")),

    // Snapshot TIME TRAVEL — the read path table_diff's versioning
    // story was missing (VERDICT r10 gap 3): a commit log staged once
    // per session (Staged.snapshotTable: init, upsert, delete,
    // checkpoint, upsert — every mutation a deterministic function of
    // `orders`), read back AS OF an INTERMEDIATE version while two
    // later commits exist in the log. Reconstruction is merge-on-read:
    // a v-range partition-pruned delta scan (later commits never
    // open — SnapshotSpec asserts the file counts) + ONE
    // latest-row-per-key hash agg, never an iterative join over the
    // log. The oracle replays the mutation script directly from
    // `orders` — the hash match proves write→log→reconstruct
    // round-trips exactly.
    Q("table_asof_read",
      (s, dir) => graft.ops.SnapshotOps
        .readAsOf(s, Staged.snapshotTable(s, dir), 2L, "o_orderkey")
        .orderBy("o_orderkey"),
      """SELECT * FROM (
        |  SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'V1' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
        |    ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1, 'I1', 1.0 FROM orders
        |  WHERE o_orderkey % 13 = 0)
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " ")),

    // The commit log AUDITED: change-type counts between version pairs
    // spanning an upsert, a delete, and a post-checkpoint upsert that
    // REVIVES tombstoned keys (%55 ≡ 0: deleted at v2, re-upserted at
    // v4 — latest-version-wins semantics made visible). The v2→v4 leg
    // reads across the checkpoint boundary, so the hash match also
    // proves base-commit replay ≡ full-log replay. Oracle: replays
    // every state from `orders` and diffs independently.
    Q("table_asof_diff",
      (s, dir) => {
        val path = Staged.snapshotTable(s, dir)
        def st(v: Long) =
          graft.ops.SnapshotOps.readAsOf(s, path, v, "o_orderkey")
        Seq((0L, 1L), (1L, 2L), (2L, 4L)).map { case (a, b) =>
          RelationalOps.snapshotDiff(st(a), st(b), "o_orderkey")
            .select(lit(a).as("from_v"), lit(b).as("to_v"),
              col("change_type"), col("n_rows").cast("long").as("n_rows"))
        }.reduce(_.unionByName(_))
          .orderBy("from_v", "change_type")
      },
      s"""WITH $snapStateCtes,
        |pairs AS (
        |  SELECT 0 AS from_v, 1 AS to_v, a.o_orderkey AS k1,
        |    b.o_orderkey AS k2,
        |    a.o_orderstatus AS st1, b.o_orderstatus AS st2,
        |    a.o_totalprice AS p1, b.o_totalprice AS p2
        |  FROM s0 a FULL JOIN s1 b ON a.o_orderkey = b.o_orderkey
        |  UNION ALL
        |  SELECT 1, 2, a.o_orderkey, b.o_orderkey,
        |    a.o_orderstatus, b.o_orderstatus,
        |    a.o_totalprice, b.o_totalprice
        |  FROM s1 a FULL JOIN s2 b ON a.o_orderkey = b.o_orderkey
        |  UNION ALL
        |  SELECT 2, 4, a.o_orderkey, b.o_orderkey,
        |    a.o_orderstatus, b.o_orderstatus,
        |    a.o_totalprice, b.o_totalprice
        |  FROM s2 a FULL JOIN s4 b ON a.o_orderkey = b.o_orderkey)
        |SELECT CAST(from_v AS BIGINT) AS from_v,
        |  CAST(to_v AS BIGINT) AS to_v, change_type,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM (
        |  SELECT from_v, to_v, CASE
        |    WHEN k1 IS NULL THEN 'added'
        |    WHEN k2 IS NULL THEN 'removed'
        |    WHEN NOT (st1 IS NOT DISTINCT FROM st2
        |      AND p1 IS NOT DISTINCT FROM p2) THEN 'changed'
        |    ELSE 'unchanged' END AS change_type
        |  FROM pairs)
        |GROUP BY from_v, to_v, change_type
        |ORDER BY from_v, change_type""".stripMargin.replace("\n", " ")),

    // Row-level CHANGE DATA FEED over the same commit log — Delta's
    // table_changes read path: every effective change in (0, 4] with
    // its commit version, change type, and pre-/post-images. ONE window
    // pass over the pruned delta scan (lag over commit order supplies
    // each write's pre-image) — one shuffle for the WHOLE range, where
    // table_asof_diff pays a full-outer join per version pair; the
    // mid-range checkpoint (v3) is skipped by path, so base-commit
    // rewrites never flood the feed with no-op rows. Oracle: replays
    // every state from `orders` and diffs consecutive states — the
    // hash match proves write-log order ≡ state-diff semantics.
    Q("snapshot_cdf",
      (s, dir) => graft.ops.SnapshotOps
        .tableChanges(s, Staged.snapshotTable(s, dir), 0L, 4L, "o_orderkey")
        .orderBy("o_orderkey", "v", "change_type"),
      s"""WITH $snapStateCtes,
        |steps AS (
        |  SELECT 1 AS v, a.o_orderkey AS k1, b.o_orderkey AS k2,
        |    a.o_orderstatus AS st1, b.o_orderstatus AS st2,
        |    a.o_totalprice AS p1, b.o_totalprice AS p2
        |  FROM s0 a FULL JOIN s1 b ON a.o_orderkey = b.o_orderkey
        |  UNION ALL
        |  SELECT 2, a.o_orderkey, b.o_orderkey, a.o_orderstatus,
        |    b.o_orderstatus, a.o_totalprice, b.o_totalprice
        |  FROM s1 a FULL JOIN s2 b ON a.o_orderkey = b.o_orderkey
        |  UNION ALL
        |  SELECT 4, a.o_orderkey, b.o_orderkey, a.o_orderstatus,
        |    b.o_orderstatus, a.o_totalprice, b.o_totalprice
        |  FROM s2 a FULL JOIN s4 b ON a.o_orderkey = b.o_orderkey),
        |upd AS (SELECT * FROM steps
        |  WHERE k1 IS NOT NULL AND k2 IS NOT NULL
        |  AND (st1 IS DISTINCT FROM st2 OR p1 IS DISTINCT FROM p2))
        |SELECT o_orderkey, CAST(v AS BIGINT) AS v, change_type,
        |  o_orderstatus, o_totalprice FROM (
        |  SELECT k2 AS o_orderkey, v, 'insert' AS change_type,
        |    st2 AS o_orderstatus, p2 AS o_totalprice FROM steps
        |  WHERE k1 IS NULL AND k2 IS NOT NULL
        |  UNION ALL
        |  SELECT k1, v, 'delete', st1, p1 FROM steps
        |  WHERE k2 IS NULL AND k1 IS NOT NULL
        |  UNION ALL
        |  SELECT k1, v, 'update_preimage', st1, p1 FROM upd
        |  UNION ALL
        |  SELECT k1, v, 'update_postimage', st2, p2 FROM upd)
        |ORDER BY o_orderkey, v, change_type"""
        .stripMargin.replace("\n", " ")),

    // Snapshot SCHEMA EVOLUTION: v0 commits three columns, v1 upserts
    // rows carrying a NEW fourth (`o_orderpriority`). readAsOf resolves
    // the schema AS OF the requested version from only the scanned
    // commit directories (merge-on-read union) — so v0 reads don't see
    // the column at all (SnapshotSpec pins that), and this v1 read
    // back-fills null for every key v1 didn't touch. No rewrite of old
    // files, no backfill job — the Delta/Iceberg evolution contract.
    Q("table_asof_schema_evo",
      (s, dir) => graft.ops.SnapshotOps
        .readAsOf(s, Staged.snapshotEvoTable(s, dir), 1L, "o_orderkey")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |CASE WHEN o_orderkey % 6 = 0 THEN 'E1' ELSE o_orderstatus END
        |  AS o_orderstatus,
        |CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice + 50.0
        |  ELSE o_totalprice END AS o_totalprice,
        |CASE WHEN o_orderkey % 6 = 0 THEN o_orderpriority
        |  ELSE NULL END AS o_orderpriority
        |FROM orders WHERE o_orderkey % 3 = 0 ORDER BY o_orderkey"""
        .stripMargin.replace("\n", " ")),

    // Snapshot VACUUM: the retention sweep that physically removes
    // commits the newest checkpoint made unreachable (v0/v1 here —
    // staged once, log mutation included). This read proves the
    // surviving log still reconstructs the head state exactly;
    // SnapshotSpec proves the swept files are GONE from disk and that
    // pre-vacuum versions now fail loudly instead of misreading.
    // Checkpoint bounds replay COST, vacuum reclaims replay STORAGE —
    // together the log stays O(retention window) at any commit rate.
    Q("snapshot_vacuum",
      (s, dir) => graft.ops.SnapshotOps
        .readAsOf(s, Staged.snapshotVacuumTable(s, dir), 3L, "o_orderkey")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |CASE WHEN o_orderkey % 10 = 0 THEN 'U3'
        |  WHEN o_orderkey % 4 = 0 THEN 'U1'
        |  ELSE o_orderstatus END AS o_orderstatus,
        |CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 30.0
        |  WHEN o_orderkey % 4 = 0 THEN o_totalprice + 10.0
        |  ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0 ORDER BY o_orderkey"""
        .stripMargin.replace("\n", " ")),

    // Right-to-be-forgotten THROUGH the commit log (GDPR erasure —
    // the structured-data sibling of pii_scan's redaction): forget =
    // tombstone + checkpoint + vacuum in one op, ONE O(state) rewrite
    // per forget batch, never a rewrite per deleted row. This read
    // proves the surviving state is exact; SnapshotSpec proves the
    // forgotten keys are byte-absent from EVERY remaining file and
    // that pre-forget versions fail loudly rather than resurrect
    // (erasure and time travel are in direct tension — forget takes
    // erasure). Oracle: the surviving-state replay from orders.
    Q("snapshot_forget",
      (s, dir) => graft.ops.SnapshotOps.readAsOf(
          s, Staged.snapshotForgetTable(s, dir), 3L, "o_orderkey")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |CASE WHEN o_orderkey % 12 = 0 THEN 'U1'
        |  ELSE o_orderstatus END AS o_orderstatus,
        |CASE WHEN o_orderkey % 12 = 0 THEN o_totalprice + 5.0
        |  ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " ")),

    // Optimistic concurrency AUDITED — the Delta-style commit protocol's
    // other half next to time travel/CDF/vacuum/forget: three writers
    // all read version 0; writer A lands v1, writer B's stale commit
    // revalidates against the unseen v1 (key-disjoint — blind upserts
    // commute) and lands v2, and writer C's overlapping commit is
    // REJECTED with ConcurrentCommitException (Staged
    // .snapshotConcurrentTable asserts the exact versions and the
    // rejection at build time). The audit reads the final state and
    // proves it is exactly "A then B, no C": per-status counts +
    // decimal-exact totals plus the log length. Oracle: the closed-form
    // A∪B mutation replayed directly from orders. Scale: validation is
    // ONE partition-pruned scan of the unseen versions only; the
    // arbiter is a rename/conditional-put, never a table lock.
    Q("snapshot_concurrent_audit",
      (s, dir) => {
        import graft.ops.SnapshotOps
        val path = Staged.snapshotConcurrentTable(s, dir)
        val nv = SnapshotOps.versions(path).length.toLong
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(30,6)")
        SnapshotOps.readAsOf(s, path, nv - 1L, "o_orderkey")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(dec(col("o_totalprice"))).cast("double"), 2)
              .as("total"))
          .withColumn("n_versions", lit(nv))
          .select(col("o_orderstatus"), col("n_orders"), col("total"),
            col("n_versions"))
          .orderBy("o_orderstatus")
      },
      """WITH fin AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'A1'
        |         WHEN o_orderkey % 7 = 3 THEN 'B1'
        |         ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         WHEN o_orderkey % 7 = 3 THEN o_totalprice + 20.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2)
        |  AS total,
        |CAST(3 AS BIGINT) AS n_versions
        |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        .stripMargin.replace("\n", " ")),

    // The SCHEMA-change side of the optimistic protocol (round 13):
    // three v0 readers — a data writer lands v1, a schema-ADD writer
    // (new column o_orderpriority) commutes with the unseen data
    // commit and lands v2, and a writer carrying the SAME column at a
    // DIFFERENT type (double vs string) is REJECTED as a schema
    // conflict, by name (unchecked it would wedge every future
    // mergeSchema read). Staged.snapshotSchemaConcTable asserts the
    // versions and the rejection at build time; the audit reads the
    // final evolved state — the new column present exactly on the
    // schema writer's keys, null-back-filled elsewhere — and the
    // oracle replays the closed-form D∪S mutation from orders.
    Q("snapshot_schema_concurrent_audit",
      (s, dir) => {
        import graft.ops.SnapshotOps
        val path = Staged.snapshotSchemaConcTable(s, dir)
        val nv = SnapshotOps.versions(path).length.toLong
        SnapshotOps.readAsOf(s, path, nv - 1L, "o_orderkey")
          .withColumn("n_versions", lit(nv))
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderpriority"),
            col("n_versions"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey,
        |CASE WHEN o_orderkey % 9 = 0 THEN 'D1'
        |     WHEN o_orderkey % 9 = 3 THEN 'S1'
        |     ELSE o_orderstatus END AS o_orderstatus,
        |CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice + 10.0
        |     WHEN o_orderkey % 9 = 3 THEN o_totalprice + 20.0
        |     ELSE o_totalprice END AS o_totalprice,
        |CASE WHEN o_orderkey % 9 = 3 THEN o_orderpriority
        |     ELSE NULL END AS o_orderpriority,
        |CAST(3 AS BIGINT) AS n_versions
        |FROM orders WHERE o_orderkey % 3 = 0
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " ")),

    // The change feed CONSUMED — CDC-driven incremental aggregate
    // maintenance (the reason a warehouse ships table_changes at all):
    // the per-status order count + revenue total is maintained from the
    // v0 aggregate plus ONLY the feed's signed deltas (+post, −pre;
    // status moves handled by each image row landing in its own status
    // bucket), never rescanning the table. Pre/post images telescope
    // exactly — update_preimage(k+1) IS the post-state of change k — so
    // with decimal-exact sums carried undowncast to the final double
    // (rounded at 2 dp — prices are 2-dp by construction, and DuckDB
    // 1.0's DECIMAL->DOUBLE cast is one ulp off correctly-rounded at
    // ~1e12 magnitudes, measured at the x100 fixture),
    // the incremental result hash-matches the oracle's DIRECT aggregate
    // over the replayed head state: the proof the feed is sufficient
    // for downstream maintenance. Cost: the one-window CDF pass + two
    // status-keyed hash-aggs; the maintained aggregate never sees the
    // base table after v0.
    Q("cdf_incremental_agg",
      (s, dir) => {
        import graft.ops.SnapshotOps
        val path = Staged.snapshotTable(s, dir)
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(30,6)")
        val base = SnapshotOps.readAsOf(s, path, 0L, "o_orderkey")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n0"),
            sum(dec(col("o_totalprice"))).as("t0"))
        val delta = SnapshotOps
          .tableChanges(s, path, 0L, 4L, "o_orderkey")
          .select(col("o_orderstatus"),
            when(col("change_type").isin("insert", "update_postimage"),
              lit(1L)).otherwise(lit(-1L)).as("sgn"),
            col("o_totalprice"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(col("sgn")).as("dn"),
            sum(when(col("sgn") === 1L, dec(col("o_totalprice")))
              .otherwise(-dec(col("o_totalprice")))).as("dt"))
        base.join(delta, Seq("o_orderstatus"), "full_outer")
          .select(col("o_orderstatus"),
            (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_orders"),
            round((coalesce(col("t0"), lit(0).cast("decimal(30,6)")) +
              coalesce(col("dt"), lit(0).cast("decimal(30,6)")))
              .cast("double"), 2).as("total"))
          .filter(col("n_orders") > 0)
          .orderBy("o_orderstatus")
      },
      s"""WITH $snapStateCtes
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2)
        |  AS total
        |FROM s4 GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        .stripMargin.replace("\n", " ")),

    // CDF as a STREAMING SOURCE — cdf_incremental_agg's streaming twin
    // (round-11 verdict item 6): the per-version change batches are
    // spooled to files exactly as a commit-log tailer would deliver
    // them, streamed back one FILE per micro-batch, and the per-status
    // aggregate is maintained from each batch's signed-delta PARTIAL
    // through the replay-safe batch_id-keyed sink — the base table is
    // never rescanned after v0. Slicing invariance is structural
    // (state = base + Σ partials, and signed deltas are additive;
    // StreamingCdfSpec pins two slicings to identical rows), so the
    // BATCH oracle — the direct aggregate over the replayed head state
    // — applies verbatim.
    Q("streaming_cdf_consume",
      (s, dir) => {
        val work = graft.util.Fs.workDir("graft_stream_cdf", dir).toString
        graft.streaming.StreamingCdf.consumeAvailableNow(
            s, Staged.snapshotTable(s, dir), work, "o_orderkey")
          .orderBy("o_orderstatus")
      },
      s"""WITH $snapStateCtes
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |round(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2)
        |  AS total
        |FROM s4 GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        .stripMargin.replace("\n", " ")),

    // Privacy-compliance profiling (the k-anonymity / l-diversity
    // audit a pipeline runs before releasing quasi-identified data —
    // the structured-data sibling of pii_scan): per quasi-identifier
    // group (nation × market segment) its size, the diversity of the
    // sensitive attribute (account balance, bucketed to $1000), and
    // the k≥5 / l≥3 pass flags. One hash-agg over the table; at
    // 100 TB the QI grouping is the same one shuffle as any groupBy,
    // and the distinct-count swaps to approx_count_distinct without
    // changing the audit contract.
    Q("k_anonymity_profile",
      (s, dir) => Tables.customer(s, dir)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("group_size"),
          countDistinct(floor(col("c_acctbal") / 1000).cast("long"))
            .as("n_sensitive_values"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("group_size").cast("long").as("group_size"),
          col("n_sensitive_values").cast("long").as("n_sensitive_values"),
          (col("group_size") >= 5).cast("int").as("k_anonymous"),
          (col("n_sensitive_values") >= 3).cast("int").as("l_diverse"))
        .orderBy("c_nationkey", "c_mktsegment"),
      """SELECT c_nationkey, c_mktsegment,
        |CAST(count(*) AS BIGINT) AS group_size,
        |CAST(count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
        |  AS BIGINT) AS n_sensitive_values,
        |CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS INT)
        |  AS k_anonymous,
        |CAST(CASE WHEN count(DISTINCT CAST(floor(c_acctbal / 1000)
        |  AS BIGINT)) >= 3 THEN 1 ELSE 0 END AS INT) AS l_diverse
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment"""
        .stripMargin.replace("\n", " ")),

    // The k-anonymization OPERATOR itself: per row, the FINEST rung of
    // the generalization ladder whose group reaches k=5 — level 0
    // (nation, segment) → 1 (region, segment) → 2 (region) → 3
    // (suppress). Three bounded group-size aggregates joined back by
    // their QI keys (each ≤ |QI domain| rows, broadcast); rows never
    // pairwise-compare. This is how a release pipeline generalizes
    // exactly as much as the data requires and no more.
    Q("qi_generalization",
      (s, dir) => {
        val k = 5L
        val cust = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
        val g0 = cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n0"))
        val g1 = cust.groupBy(col("n_regionkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n1"))
        val g2 = cust.groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n2"))
        cust
          .join(broadcast(g0), Seq("c_nationkey", "c_mktsegment"))
          .join(broadcast(g1), Seq("n_regionkey", "c_mktsegment"))
          .join(broadcast(g2), Seq("n_regionkey"))
          .select(col("c_custkey"), col("c_nationkey"),
            col("n_regionkey").cast("int").as("n_regionkey"),
            col("c_mktsegment"),
            when(col("n0") >= k, 0).when(col("n1") >= k, 1)
              .when(col("n2") >= k, 2).otherwise(3)
              .cast("int").as("gen_level"))
          .orderBy("c_custkey")
      },
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey, n_regionkey, c_mktsegment
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |g0 AS (SELECT c_nationkey, c_mktsegment, count(*) AS n0
        |  FROM cust GROUP BY 1, 2),
        |g1 AS (SELECT n_regionkey, c_mktsegment, count(*) AS n1
        |  FROM cust GROUP BY 1, 2),
        |g2 AS (SELECT n_regionkey, count(*) AS n2 FROM cust GROUP BY 1)
        |SELECT c.c_custkey, c.c_nationkey,
        |CAST(c.n_regionkey AS INT) AS n_regionkey, c.c_mktsegment,
        |CAST(CASE WHEN n0 >= 5 THEN 0 WHEN n1 >= 5 THEN 1
        |  WHEN n2 >= 5 THEN 2 ELSE 3 END AS INT) AS gen_level
        |FROM cust c
        |JOIN g0 ON c.c_nationkey = g0.c_nationkey
        |  AND c.c_mktsegment = g0.c_mktsegment
        |JOIN g1 ON c.n_regionkey = g1.n_regionkey
        |  AND c.c_mktsegment = g1.c_mktsegment
        |JOIN g2 ON c.n_regionkey = g2.n_regionkey
        |ORDER BY c.c_custkey""".stripMargin.replace("\n", " ")),

    // Scalar-function family: date parts / formatting / string build.
    Q("order_date_parts",
      (s, dir) => RelationalOps.orderDateParts(Tables.orders(s, dir))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS INT) AS o_year,
        |CAST(month(o_orderdate) AS INT) AS o_month,
        |CAST(day(o_orderdate) AS INT) AS o_day,
        |upper(strftime(o_orderdate, '%b')) AS o_mon_name,
        |date_trunc('month', o_orderdate) AS o_month_start,
        |concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio
        |FROM orders ORDER BY o_orderkey""".stripMargin.replace("\n", " "))
  )

  /** DuckDB replay of the staged snapshot table's deterministic
    * mutation script (Staged.snapshotTable): the state at versions
    * 0/1/2/4, each derived independently from `orders` — shared by the
    * time-travel read, the per-pair diff audit, and the change feed. */
  private lazy val snapStateCtes: String =
    """s0 AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |s1 AS (
      |  SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 7 = 0 THEN 'V1' ELSE o_orderstatus END
      |    AS o_orderstatus,
      |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
      |    ELSE o_totalprice END AS o_totalprice
      |  FROM orders
      |  UNION ALL
      |  SELECT -o_orderkey - 1, 'I1', 1.0 FROM orders
      |  WHERE o_orderkey % 13 = 0),
      |s2 AS (
      |  SELECT * FROM s1
      |  WHERE o_orderkey < 0 OR o_orderkey % 11 <> 0),
      |s4 AS (
      |  SELECT o_orderkey, 'V4' AS o_orderstatus,
      |    o_totalprice + 200.0 AS o_totalprice
      |  FROM orders WHERE o_orderkey % 5 = 0
      |  UNION ALL
      |  SELECT * FROM s2
      |  WHERE o_orderkey < 0 OR o_orderkey % 5 <> 0)"""
      .stripMargin.replace("\n", " ")
}
