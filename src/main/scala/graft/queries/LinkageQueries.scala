package graft.queries

import graft.{Q, Tables}
import graft.ops.{Determinism, LinkageOps, RelationalOps, WarehouseOps}
import org.apache.spark.sql.functions._

/** Data-integration surface: blocked fuzzy record linkage, bloom-filter
  * runtime-filtered joins, and MERGE-style upserts — the operators that
  * sit between raw ingestion and the analytic warehouse.
  */
object LinkageQueries {

  val all: Seq[Q] = Seq(

    // Blocked fuzzy self-join on the part-name vocabulary: dedupe to
    // DISTINCT names (vocabulary grows sublinearly in rows), block on
    // the head noun, verify levenshtein <= 3. Σ|block|² is bounded by
    // the block-size cap — the all-pairs edit-distance join never runs.
    Q("fuzzy_join_parts",
      (s, dir) => LinkageOps.fuzzyPartNames(Tables.part(s, dir), 3)
        .select(col("name_a"), col("name_b"), col("dist"))
        .orderBy("name_a", "name_b"),
      """WITH vocab AS (SELECT DISTINCT p_name AS name FROM part),
        |v AS (SELECT name,
        |  (regexp_split_to_array(name, '\s+'))[-1] AS block FROM vocab),
        |keep AS (SELECT block FROM
        |  (SELECT block, count(*) AS c FROM v GROUP BY 1) WHERE c <= 1000),
        |k AS (SELECT v.name, v.block FROM v JOIN keep ON v.block = keep.block)
        |SELECT a.name AS name_a, b.name AS name_b,
        |CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM k a JOIN k b ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY name_a, name_b""".stripMargin.replace("\n", " ")),

    // Evaluation twin of the blocked fuzzy join: recall of the
    // noun-block candidate set vs the exact all-pairs edit-distance
    // screen — the number that tunes the blocking key (same discipline
    // as ann_recall_*). The exact side crossJoins only the DISTINCT
    // name vocabulary (bounded by the generator's vocabulary, sublinear
    // in corpus rows) — whitelisted as an eval baseline.
    Q("fuzzy_block_recall",
      (s, dir) => LinkageOps.fuzzyBlockRecall(Tables.part(s, dir), 3),
      """WITH vocab AS (SELECT DISTINCT p_name AS name FROM part),
        |tp AS (SELECT count(*) AS n_true_pairs FROM vocab a
        |  JOIN vocab b ON a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 3),
        |v AS (SELECT name,
        |  (regexp_split_to_array(name, '\s+'))[-1] AS block FROM vocab),
        |keep AS (SELECT block FROM
        |  (SELECT block, count(*) AS c FROM v GROUP BY 1) WHERE c <= 1000),
        |k AS (SELECT v.name, v.block FROM v JOIN keep ON v.block = keep.block),
        |bp AS (SELECT count(*) AS n_blocked_pairs
        |  FROM k a JOIN k b ON a.block = b.block AND a.name < b.name
        |  WHERE levenshtein(a.name, b.name) <= 3)
        |SELECT n_true_pairs, n_blocked_pairs,
        |round(n_blocked_pairs::DOUBLE / nullif(n_true_pairs::DOUBLE, 0), 6)
        |  AS recall
        |FROM tp CROSS JOIN bp""".stripMargin.replace("\n", " ")),

    // Bloom-filter runtime-filtered semi-join: lineitems of URGENT
    // orders. The fact scan is pre-pruned by an O(bits) bloom sketch of
    // the dim keys (Spark's own BloomFilterAggregate/MightContain as
    // explicit operators), then the exact semi-join kills false
    // positives — result is exact, plan shape is InjectRuntimeFilter's.
    Q("bloom_semi_join",
      (s, dir) => {
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
        RelationalOps.bloomSemiJoin(
            Tables.lineitem(s, dir), "l_orderkey", urgent, "o_orderkey",
            estimatedNumItems = 100000L)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            Determinism.exactSum(col("l_quantity")).as("sum_qty"),
            Determinism.exactSum(col("l_extendedprice")).as("sum_price"))
          .orderBy("l_returnflag")
      },
      s"""SELECT l_returnflag, count(*) AS n_items,
         |${Determinism.sqlExactSum("l_quantity")} AS sum_qty,
         |${Determinism.sqlExactSum("l_extendedprice")} AS sum_price
         |FROM lineitem WHERE l_orderkey IN
         |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         |GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", " ")),

    // MERGE-style upsert (ops.WarehouseOps.upsert): deterministic
    // update/insert set derived from the base table itself — keys
    // divisible by 10 get a status/price update, and re-keyed copies
    // insert as new rows. Updates win, unmatched base rows survive,
    // `src` audits kept/updated/inserted. Insert keys are -k-1:
    // strictly negative, so disjoint from every base orderkey (>= 0)
    // at ANY scale — an additive offset collided with MakeScale's
    // per-copy +1e8 shift on the synthesized sf1 fixture, making copy
    // c's inserts alias copy c+1's update keys (and bare negation
    // collides on key 0, which the fixture contains).
    Q("warehouse_upsert",
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val hit = base.filter(col("o_orderkey") % 10 === 0)
        val updated = hit.select(col("o_orderkey"),
          lit("U").as("o_orderstatus"),
          (col("o_totalprice") + lit(100.0)).as("o_totalprice"))
        val inserted = hit.select(
          (-col("o_orderkey") - lit(1L)).as("o_orderkey"),
          lit("N").as("o_orderstatus"), lit(0.0).as("o_totalprice"))
        WarehouseOps.upsert(base, updated.unionByName(inserted), "o_orderkey")
          .withColumnRenamed("__src", "src")
          .orderBy("o_orderkey")
      },
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus,
        |    o_totalprice + 100.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1, 'N', 0.0
        |  FROM base WHERE o_orderkey % 10 = 0)
        |SELECT coalesce(u.o_orderkey, b.o_orderkey) AS o_orderkey,
        |coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |coalesce(u.o_totalprice, b.o_totalprice) AS o_totalprice,
        |CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
        |  WHEN u.o_orderkey IS NULL THEN 'kept'
        |  ELSE 'updated' END AS src
        |FROM base b FULL JOIN upd u ON b.o_orderkey = u.o_orderkey
        |ORDER BY o_orderkey""".stripMargin.replace("\n", " ")),

    // SCD Type-2 dimension history (ops.WarehouseOps.scd2FromChangeLog):
    // the customer's order-status timeline as a versioned dimension —
    // per-(custkey, day) change log (max_by(orderkey) dedupes same-day
    // changes deterministically), consecutive identical statuses
    // collapse into one run, and each run carries half-open
    // [effective_from, effective_to) validity + is_current. One shuffle
    // on the key; both window passes share the (key, ts) sort.
    Q("scd2_dim",
      (s, dir) => {
        val log = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("custkey"),
            col("o_orderdate").as("change_date"))
          .agg(max_by(col("o_orderstatus"), col("o_orderkey")).as("status"))
        WarehouseOps.scd2FromChangeLog(log, "custkey", "change_date",
            Seq("status"))
          .orderBy("custkey", "effective_from")
      },
      """WITH log AS (
        |  SELECT o_custkey AS custkey, o_orderdate AS change_date,
        |    arg_max(o_orderstatus, o_orderkey) AS status
        |  FROM orders GROUP BY 1, 2),
        |runs AS (
        |  SELECT custkey, change_date, status,
        |    lag(status) OVER (PARTITION BY custkey ORDER BY change_date)
        |      AS prev
        |  FROM log),
        |hist AS (
        |  SELECT custkey, change_date, status FROM runs
        |  WHERE prev IS NULL OR prev IS DISTINCT FROM status)
        |SELECT custkey, status, change_date AS effective_from,
        |  lead(change_date) OVER (PARTITION BY custkey ORDER BY change_date)
        |    AS effective_to,
        |  lead(change_date) OVER (PARTITION BY custkey ORDER BY change_date)
        |    IS NULL AS is_current
        |FROM hist ORDER BY custkey, effective_from"""
        .stripMargin.replace("\n", " "))
  )
}
