package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Determinism._

/** General relational/warehouse analytics over the star schema — the
  * engine surface the reference delegates to Postgres (E3), widened to the
  * full operator families SURVEY.md §2 catalogues (grouped multi-agg,
  * multi-hop joins, top-k, rollup/cube, distinct agg, set ops).
  *
  * Scale notes: dimension tables (nation/region/customer/supplier/part)
  * are broadcast — at 100 TB the fact-side scan never shuffles for these
  * joins. Aggregations go through HashAggregateExec with map-side partials;
  * top-k is TakeOrderedAndProject (per-partition heap + driver merge of K
  * rows, never a full sort of the data).
  */
object RelationalOps {

  /** TPC-H Q1-style pricing summary: grouped multi-aggregate scan.
    * Projection+filter push to parquet; one hash-agg shuffle over a
    * 2-value×2-value grouping key. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        exactSum(col("l_quantity")).as("sum_qty"),
        exactSum(col("l_extendedprice")).as("sum_base_price"),
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        exactAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Revenue by nation: fact table through a 3-hop dimension chain
    * (lineitem→orders→customer→nation), all dims broadcast. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ×
    * date-filtered orders × date-filtered lineitems → per-order revenue →
    * top-k. Filters sit directly on the base tables so they push to the
    * parquet scans; the filtered customer key set broadcasts; only the
    * (o_orderkey, o_orderdate) agg shuffles; the top-k plans as
    * TakeOrderedAndProject (never a full sort). Unique o_orderkey
    * tiebreak keeps the cut deterministic. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       cutoff: String, k: Int): DataFrame =
    lineitem
      .filter(col("l_shipdate") > lit(cutoff))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(orders.filter(col("o_orderdate") < lit(cutoff))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)
        .select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-side
    * query — every predicate (date window, discount band, quantity
    * cap) pushes to the parquet reader, the aggregate is one partial-
    * sum row per task, and NOTHING shuffles but |tasks| partial rows.
    * The canonical "is pushdown working" probe. */
  def forecastRevenue(lineitem: DataFrame, from: String, until: String,
                      discLo: Double, discHi: Double,
                      qtyBelow: Double): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from) &&
        col("l_shipdate") < lit(until) &&
        col("l_discount") >= lit(discLo) &&
        col("l_discount") <= lit(discHi) &&
        col("l_quantity") < lit(qtyBelow))
      .agg(exactSum(col("l_extendedprice") * col("l_discount"))
        .as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q10 shape (returned-item report): one quarter's returns
    * joined through orders to the customer dimension, top-20 customers
    * by lost revenue. Facts shuffle once on the order key; customer
    * and nation broadcast; the top-k is TakeOrderedAndProject. */
  def returnedItemReport(lineitem: DataFrame, orders: DataFrame,
                         customer: DataFrame, nation: DataFrame,
                         from: String, until: String, k: Int): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(orders
        .filter(col("o_orderdate") >= lit(from) &&
          col("o_orderdate") < lit(until))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"),
        col("c_acctbal"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)

  /** TPC-H Q5 shape (local supplier volume): the 6-table join with the
    * co-location constraint — revenue only counts when the CUSTOMER and
    * the SUPPLIER sit in the same nation of the probed region. Join
    * order is hand-shaped for scale: region⨝nation prunes to the
    * region's nation keys FIRST and that tiny set broadcasts into both
    * the supplier and customer sides, so the two fact-side hash joins
    * (lineitem⨝orders on orderkey, then ⨝customer on custkey) only
    * ever see region-local rows; the supplier and customer dims ride
    * broadcasts, the date filter pushes to the orders scan, and the
    * only shuffles are the two fact-key joins plus the final tiny
    * n_name agg. The c_nationkey = s_nationkey predicate lives in the
    * supplier join condition — never a post-join filter over a wider
    * product. */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          regionName: String, d0: String,
                          d1: String): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val localCust = customer
      .join(broadcast(regionNations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val localSupp = supplier
      .join(broadcast(regionNations.select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"))
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(orders
        .filter(col("o_orderdate") >= lit(d0) && col("o_orderdate") < lit(d1))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(localCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(localSupp),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(regionNations),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q4 shape (order-priority checking): orders in a date window
    * that have AT LEAST ONE late lineitem (shipped more than
    * `lateDays` after the order date), counted per priority — the
    * correlated-EXISTS pattern, planned as a LEFT SEMI join on the
    * order key with the cross-table lateness predicate inside the join
    * condition (the decorrelation Spark and every serious optimizer
    * apply; never a per-row subquery). The semi join emits each
    * qualifying order once no matter how many late items it has, the
    * date filter pushes to the orders scan, and the final agg groups a
    * handful of priority strings — the only shuffles are the semi
    * join's key exchange and that tiny agg. */
  def latePriorityOrders(orders: DataFrame, lineitem: DataFrame,
                         d0: String, d1: String,
                         lateDays: Int): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(d0) && col("o_orderdate") < lit(d1))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_orderpriority"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $lateDays DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** Top-k customers by order spend (sort/limit family — absent from the
    * reference, SURVEY.md §2.6). Unique tiebreak on the key keeps the
    * result deterministic; plans as TakeOrderedAndProject. */
  def topCustomers(orders: DataFrame, customer: DataFrame, k: Int): DataFrame =
    orders
      .groupBy(col("o_custkey"))
      .agg(exactSum(col("o_totalprice")).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spend"), col("n_orders"))
      .orderBy(col("total_spend").desc, col("c_custkey").asc)
      .limit(k)

  /** ROLLUP over order status × priority (grouping-sets family —
    * SURVEY.md §2.4 "not present in reference", added as engine surface). */
  def ordersRollup(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        exactSum(col("o_totalprice")).as("total_price"))

  /** Distinct aggregates: exact + approximate cardinalities per group.
    * approx_count_distinct (HLL++) is the 100 TB-scale path; the exact
    * twin stays for the oracle. */
  def orderStats(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))

  /** Set operation (SO-family): customers with open orders but no
    * finished orders — EXCEPT on distinct key sets. */
  def custkeysExcept(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
      .except(orders.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct())

  /** Skew-safe two-phase aggregation: salt the grouping key, partially
    * aggregate per (key, salt), then finalize per key. Bit-identical to
    * the direct aggregation when the partial is decimal-exact (sums /
    * counts / min / max), which the shared oracle enforces. At 100 TB
    * this is the standard defense when one key holds a large share of
    * the rows and a single reducer would become the straggler. */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
                nSalts: Int): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // any row→salt assignment is correct (the final phase re-merges);
    // a row id spreads each hot key evenly across nSalts partial groups
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(
        sum(col(valueCol).cast(DecimalType(30, 6))).as("p_sum"),
        count(lit(1)).as("p_n"),
        min(col(valueCol)).as("p_min"),
        max(col(valueCol)).as("p_max"))
    partial.groupBy(col(key))
      .agg(
        sum(col("p_sum")).cast(DoubleType).as("sum_value"),
        sum(col("p_n")).as("n_rows"),
        min(col("p_min")).as("min_value"),
        max(col("p_max")).as("max_value"))
  }

  /** Scalar-function showcase (F-family): date parts, formatting, string
    * build — the reference's folder-name/date plumbing (`:15-32`) as
    * column expressions. */
  def orderDateParts(orders: DataFrame): DataFrame =
    orders.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        upper(date_format(col("o_orderdate"), "MMM")).as("o_mon_name"),
        date_trunc("month", col("o_orderdate")).as("o_month_start"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"))

  /** Bloom-filter runtime-filtered semi-join: reduce `fact` to rows whose
    * `factKey` appears in `dim`'s `dimKey` set, pruning the fact scan
    * with an O(bits) bloom sketch BEFORE the exact semi-join kills the
    * bloom's false positives — Spark's InjectRuntimeFilter shape as an
    * explicit operator (functions.BloomFunctions).
    *
    * The sketch is one binary blob aggregated from the dim side and
    * embedded as a literal — the only driver-held state, a few hundred
    * KB regardless of data scale (the same thing Spark's injected
    * runtime filters ship in a scalar subquery). At 100 TB the win is
    * that most fact partitions drop to near-empty before the shuffle
    * for the exact semi-join; the bloom probe itself is a codegen'd
    * narrow filter with zero shuffle. Results are EXACT — the final
    * semi-join verifies every candidate.
    *
    * STATIC-INPUT ASSUMPTION: the sketch is collected in its own job
    * before the semi-join job runs, so `dim` must evaluate to the same
    * rows in both (true for batch file sources like parquet). A
    * non-static dim (a view over changing data, rand()-dependent plan)
    * could grow keys between the jobs and the stale sketch would then
    * wrongly drop matching fact rows BEFORE the verifying join — a
    * false negative, not just a lost optimization. For such inputs,
    * `dim.cache()` (or checkpoint) first so both jobs see one
    * snapshot. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    estimatedNumItems: Long = 1000000L): DataFrame = {
    val spark = fact.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val sketch = dim.agg(
      call_function("graft_bloom_agg", col(dimKey), lit(estimatedNumItems))
        .as("bf"))
      .head().getAs[Array[Byte]]("bf")
    fact
      .filter(call_function("graft_bloom_contains", lit(sketch), col(factKey)))
      .join(dim.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }

  /** Snapshot diff (the table-versioning audit: what changed between
    * two versions of a keyed table): one full-outer join on the key,
    * row payloads compared as null-safe structs, reduced to per-type
    * counts. One shuffle on the key at any scale (or zero with
    * bucketed/co-partitioned snapshots); the payload comparison is a
    * narrow codegen'd struct equality, no per-column join conditions. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, key: String): DataFrame = {
    val payload = v1.columns.filter(_ != key)
    val a = v1.select(col(key).as("k1"),
      struct(payload.map(col): _*).as("r1"))
    val b = v2.select(col(key).as("k2"),
      struct(payload.map(col): _*).as("r2"))
    a.join(b, col("k1") === col("k2"), "full_outer")
      .select(
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(!(col("r1") <=> col("r2")), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q2 shape (min-cost supplier), adapted to the fixture's star
    * schema (no partsupp table — the lineitem fact is the part↔supplier
    * price evidence): for each filtered part, the supplier with the
    * LOWEST observed unit price. Decorrelated from Q2's correlated MIN
    * subquery into one aggregate + one per-part argmin window: unit
    * prices aggregate to per-(part, supplier) minima first (fact
    * shuffles ONCE on the composite key), then a window over the
    * |parts|×|suppliers|-bounded aggregate picks each part's winner —
    * never a window over raw fact rows. Part filter pushes to the scan
    * and the filtered part set broadcasts, so at 100 TB the fact scan
    * prunes before the only shuffle. Unit price is fixed to integer
    * micro-units (scale-0 rounding — the one scale whose .5 boundary is
    * binary-representable, hence engine-portable) BEFORE the min so
    * argmin ties break identically in both engines. */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
                      supplier: DataFrame, nation: DataFrame,
                      pType: String, maxSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = part
      .filter(col("p_type") === pType && col("p_size") <= maxSize)
      .select(col("p_partkey"), col("p_name"))
    val perSupp = lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * lit(1000000.0) / col("l_quantity"), 0)
          / lit(1000000.0)).as("unit_price"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(col("unit_price")).as("min_unit_price"))
    val w = Window.partitionBy(col("p_partkey"))
      .orderBy(col("min_unit_price").asc, col("l_suppkey").asc)
    perSupp
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"), col("min_unit_price"))
  }

  /** TPC-H Q12 shape (shipping-mode priority classification; the fixture
    * carries no l_shipmode, so the classifying dimension is
    * l_linestatus): per class, CASE-split counts of high- vs
    * low-priority orders inside a ship-date window. The date filter
    * pushes to the fact scan; the orders side projects two columns and
    * the join shuffles both sides on the order key once (orders is the
    * same order of magnitude as lineitem — NOT broadcast); the CASE
    * aggregation is map-side partial. */
  def priorityByLinestatus(lineitem: DataFrame, orders: DataFrame,
                           d0: String, d1: String): DataFrame = {
    val high = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    lineitem
      .filter(col("l_shipdate") >= lit(d0) && col("l_shipdate") < lit(d1))
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** TPC-H Q14 shape (promotion revenue share): the PROMO fraction of
    * discounted revenue in one ship-date month. Part is broadcast (the
    * only join), both sums are one map-side-partial aggregate over the
    * date-pruned fact scan, and the ratio is a single-row post-agg
    * projection — the whole query is one scan + one broadcast join at
    * any scale. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        d0: String, d1: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") >= lit(d0) && col("l_shipdate") < lit(d1))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        exactSum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)))
          .as("promo_revenue"),
        exactSum(rev).as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
          .as("promo_pct"))
  }

  /** TPC-H Q18 shape (large-volume customers): orders whose total
    * line quantity exceeds `minQty`, with their customer, top-k by
    * order value. The HAVING aggregate runs FIRST over two fact columns
    * (one shuffle on the order key, map-side partials), so the join
    * input is the small surviving order set; customer broadcasts; the
    * top-k is TakeOrderedAndProject. Quantity sums are decimal-exact
    * so the HAVING cut is engine-portable. */
  def largeVolumeOrders(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, minQty: Double,
                        k: Int): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(exactSum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"), col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** TPC-H Q19 shape (disjunctive predicate join): revenue from three
    * OR-ed (brand, size-range, quantity-range) branches, reported per
    * brand. The branch predicates mix columns from BOTH join sides, so
    * no engine can push the full disjunction below the join — the
    * hand-shaped scale move is deriving each side's predicate
    * SUPERSET (brand ∈ {..} ∧ size-range union on part; quantity-range
    * union on lineitem) so the broadcast side shrinks to the eligible
    * parts and the fact scan prunes rows before the join, leaving the
    * exact disjunction as a post-join filter over the survivors. */
  def disjunctiveBrandRevenue(
      lineitem: DataFrame, part: DataFrame,
      branches: Seq[(String, (Int, Int), (Double, Double))]): DataFrame = {
    val partSuper = branches.map { case (b, (s0, s1), _) =>
      col("p_brand") === b && col("p_size").between(s0, s1)
    }.reduce(_ || _)
    val liSuper = branches.map { case (_, _, (q0, q1)) =>
      col("l_quantity").between(q0, q1)
    }.reduce(_ || _)
    val exact = branches.map { case (b, (s0, s1), (q0, q1)) =>
      col("p_brand") === b && col("p_size").between(s0, s1) &&
        col("l_quantity").between(q0, q1)
    }.reduce(_ || _)
    lineitem
      .filter(liSuper)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .join(broadcast(part.filter(partSuper)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(exact)
      .groupBy(col("p_brand"))
      .agg(exactSum(col("rev")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** CONSULT the CMS join-size estimate to pick a join strategy — the
    * loop from "what a cost-based planner consults" (`join_size_est`)
    * to a consulted number. The first join's estimated OUTPUT decides
    * the second join's strategy: an estimated |A⋈B| within
    * `broadcastRowLimit` broadcasts the joined result into the fact
    * `c`; anything larger is pinned to a shuffle join. The estimate is
    * two single-scan d×w sketches + an O(d·w) merge (never a key
    * exchange, never the join itself) — exactly the number Spark's own
    * size-in-bytes stats CANNOT give for a join OUTPUT, which is why
    * engines carry cardinality sketches for multi-join planning.
    * Both branches hint explicitly: the decision belongs to the
    * consulted estimate, not to whatever AQE guesses later (AQE still
    * re-splits skew inside the chosen strategy).
    *
    * The sketch's bias is one-sided (AMS inner product over-counts by
    * collision cross terms, E ≈ nA·nB/w per row), so a wrong answer can
    * only DECLINE a broadcast that would have fit — the safe direction;
    * it can never broadcast something the estimate said was small when
    * it wasn't. Returns (plan, estimatedRows, broadcastChosen). */
  def estimateAdvisedJoin(a: DataFrame, aKey: String,
                          b: DataFrame, bKey: String,
                          c: DataFrame, cKey: String, abProbeKey: String,
                          d: Int, w: Int,
                          broadcastRowLimit: Long): (DataFrame, Long, Boolean) = {
    val est = SketchOps.cmsJoinSizeEst(a, col(aKey), b, col(bKey), d, w)
      .head().getLong(0)
    // the first join is left to the optimizer's own stats (its inputs
    // are scans, where size-in-bytes IS available); only the second
    // join — whose build side is a join OUTPUT no static stat covers —
    // consults the sketch. `abProbeKey` is the A-side column the fact
    // `c` probes on.
    val ab = a.join(b, col(aKey) === col(bKey))
    val useBroadcast = est <= broadcastRowLimit
    val joined =
      if (useBroadcast) c.join(broadcast(ab), col(cKey) === col(abProbeKey))
      else c.join(ab.hint("merge"), col(cKey) === col(abProbeKey))
    (joined, est, useBroadcast)
  }

  /** TPC-H Q13 shape: per-customer order counts with ZERO-order
    * customers kept, rolled into a count-of-counts distribution. The
    * correlated form (`count(*) FROM orders WHERE o_custkey = c_custkey
    * AND ...`) decorrelates into: pre-aggregate the fact on its own key
    * (one shuffle, map-side partials), LEFT join from the customer side,
    * coalesce the miss to 0 so empty groups survive — the thing a naive
    * inner-join+groupBy silently drops. The second aggregate (the
    * distribution) groups on the tiny c_count domain. At 100 TB both
    * sides shuffle once on custkey; nothing is collected. */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame,
                                excludePriorities: Seq[String]): DataFrame = {
    val counted = orders
      .filter(!col("o_orderpriority").isin(excludePriorities: _*))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    customer.select(col("c_custkey"))
      .join(counted, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17 shape: revenue of small-quantity lines, where "small" is
    * a CORRELATED scalar — 0.2 × the part's own average quantity.
    * Decorrelation: the brand-filtered part keys broadcast into the fact
    * scan; the per-part threshold is an aggregate over exactly those
    * keys (itself part-bounded, so it broadcasts back); the final filter
    * + sum is one pass. The correlated subquery never executes per-row —
    * at 100 TB this is two broadcast joins and two aggregates, zero
    * fact-side re-scans. Threshold arithmetic goes through exactAvg on
    * both engines so the strict `<` can't flip on a last-ulp
    * disagreement. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame,
                           brand: String, frac: Double): DataFrame = {
    val parts = part.filter(col("p_brand") === brand).select(col("p_partkey"))
    val li = lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val limits = li.groupBy(col("l_partkey").as("t_partkey"))
      .agg((exactAvg(col("l_quantity")) * lit(frac)).as("qty_limit"))
    li.join(broadcast(limits), col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg((exactSum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  /** TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    * finished multi-supplier order — a double-correlated EXISTS /
    * NOT-EXISTS against the same fact. Decorrelation: one
    * lineitem⋈orders join on orderkey tags each line late/on-time; the
    * per-order profile (distinct suppliers, distinct LATE suppliers)
    * is a groupBy on the SAME key, so Catalyst reuses the join's
    * exchange; EXISTS becomes `n_supp > 1`, NOT-EXISTS becomes
    * `n_late_supp = 1` on a line already known late. supplier⋈nation is
    * broadcast. At 100 TB: one orderkey shuffle amortized across the
    * join and both correlates — the naive form would re-scan lineitem
    * twice per outer row. */
  def waitingSuppliers(supplier: DataFrame, lineitem: DataFrame,
                       orders: DataFrame, nation: DataFrame,
                       nationName: String, lateDays: Int): DataFrame = {
    val lo = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") +
          expr(s"INTERVAL $lateDays DAYS"))
    // Two-pass distinct-then-count, NOT a double countDistinct: two
    // distinct aggregates over one groupBy plan through Spark's Expand
    // (every fact row duplicated per distinct column → the orderkey
    // exchange ships 2× the join output; the ×10 decade measured 6.7×
    // from exactly that, BASELINE.md round 10). Instead the fact rows
    // collapse to DISTINCT (order, supplier) pairs first — partial
    // aggregation combines map-side, so the first exchange carries
    // ~distinct pairs, not items — and both per-order profiles are
    // windows over that one pair-agg exchange (count + conditional
    // count share the orderkey partitioning; late-item counts ride the
    // same pass, so the raw fact table is never rejoined). */
    val pairAgg = lo.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late_items"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"))
    val profiled = pairAgg
      .withColumn("n_supp", count(lit(1)).over(wOrd))
      .withColumn("n_late_supp",
        count(when(col("supp_late"), lit(1))).over(wOrd))
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)
          .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    profiled
      .filter(col("supp_late") && col("n_supp") > 1 &&
        col("n_late_supp") === 1)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_late_items")).as("numwait"))
  }

  /** TPC-H Q11 shape: groups whose aggregate clears a GLOBAL-scalar
    * threshold (an uncorrelated subquery in HAVING) — here parts whose
    * revenue exceeds `factor` × the average per-part revenue (TPC-H's
    * 0.0001/SF constant made scale-free). Decorrelation: the 1-row
    * global aggregate broadcast-crosses into the per-part aggregate's
    * filter; one fact scan feeds both via exchange reuse when plans
    * align, and the threshold compare is exactSum arithmetic on both
    * engines. */
  def importantParts(lineitem: DataFrame, factor: Double): DataFrame = {
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
    val perPart = lineitem.groupBy(col("l_partkey"))
      .agg(exactSum(rev).as("value"))
    val global = lineitem.agg(
      (lit(factor) * exactSum(rev) / countDistinct(col("l_partkey")))
        .as("threshold"))
    perPart.crossJoin(broadcast(global))
      .filter(col("value") > col("threshold"))
      .select(col("l_partkey"), col("value"))
  }

  /** TPC-H Q15 shape: argmax against an aggregated view — the
    * supplier(s) whose windowed revenue EQUALS the view's max (a scalar
    * subquery over the same aggregate). Decorrelation: the revenue view
    * aggregates once; its 1-row max broadcast-crosses back as an
    * equality filter (exact decimal sums make the double equality
    * engine-portable); supplier is a broadcast dim. */
  def topRevenueSupplier(lineitem: DataFrame, supplier: DataFrame,
                         fromDate: String, toDate: String): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(fromDate).cast("date") &&
        col("l_shipdate") < lit(toDate).cast("date"))
      .groupBy(col("l_suppkey"))
      .agg(exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q16 shape: distinct-supplier counts per part attribute with
    * a NOT-IN exclusion set — suppliers with a negative balance (the
    * fixture's complaints stand-in) never count. Decorrelation: NOT IN
    * over a non-null key column is a left_anti join; the exclusion set
    * and the filtered part attributes both broadcast, so the fact scan
    * never shuffles before the distinct-count aggregate. */
  def supplierCountByPartAttrs(lineitem: DataFrame, part: DataFrame,
                               supplier: DataFrame, excludeBrand: String,
                               sizes: Seq[Int]): DataFrame = {
    val excluded = supplier.filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val parts = part
      .filter(col("p_brand") =!= excludeBrand && col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20 shape: membership in a correlated agg-vs-agg threshold —
    * suppliers whose PROMO-part quantity in the window exceeds `frac` ×
    * their total shipped quantity (TPC-H's available-stock comparison
    * re-keyed to the fixture, which has no partsupp). Decorrelation:
    * the correlated per-supplier sums collapse into ONE grouped
    * aggregate with a conditional sum — the IN-subquery becomes a
    * semi-join of the qualifying keys into the supplier dim (broadcast:
    * qualifying keys ≤ |suppliers|). */
  def promoHeavySuppliers(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame, fromDate: String,
                          toDate: String, frac: Double): DataFrame = {
    val promoParts = part.select(col("p_partkey"),
      (col("p_type") === "PROMO").as("is_promo"))
    val qualifying = lineitem
      .filter(col("l_shipdate") >= lit(fromDate).cast("date") &&
        col("l_shipdate") < lit(toDate).cast("date"))
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(
        exactSum(when(col("is_promo"), col("l_quantity")).otherwise(0.0))
          .as("promo_qty"),
        exactSum(col("l_quantity")).as("total_qty"))
      .filter(col("promo_qty") > lit(frac) * col("total_qty"))
      .select(col("l_suppkey"))
    supplier.join(broadcast(qualifying),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** TPC-H Q22 shape: high-balance customers in a code set with no
    * RECENT orders — NOT-IN/NOT-EXISTS anti-join + an uncorrelated
    * scalar subquery + substring grouping. Decorrelation: the scalar avg
    * is a 1-row aggregate broadcast-crossed into the filter (never a
    * per-row subquery); NOT EXISTS is a left_anti join against the
    * date-filtered order keys (the filter pushes to the orders scan, so
    * the anti side is the recent slice, not the whole fact). */
  def dormantHighValueCustomers(customer: DataFrame, orders: DataFrame,
                                codes: Seq[String],
                                sinceDate: String): DataFrame = {
    val sel = customer
      .withColumn("cntrycode", substring(col("c_name"), 16, 2))
      .filter(col("cntrycode").isin(codes: _*))
      .select(col("cntrycode"), col("c_custkey"), col("c_acctbal"))
    val avgBal = sel.filter(col("c_acctbal") > 0.0)
      .agg(exactAvg(col("c_acctbal")).as("avg_bal"))
    val recent = orders.filter(col("o_orderdate") >= lit(sinceDate).cast("date"))
      .select(col("o_custkey"))
    sel.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        exactSum(col("c_acctbal")).as("totacctbal"))
  }
}
