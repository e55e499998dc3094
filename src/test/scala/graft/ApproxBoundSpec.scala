package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error bound for the HLL++ distinct-count estimator. The raw
  * estimates can't be hash-matched by any cross-engine oracle, so the
  * bound lives here: rsd=0.02 (worst observed group error 3.3% — HLL++
  * is deterministic, so the margin is stable run-to-run); each group's
  * estimate must sit within 5% of the exact `order_stats` twin at both
  * the correctness SF (0.01) and the bench SF (0.1). The REGISTERED
  * `order_stats_approx` query wraps the same estimator into an
  * oracle-able self-check (booleans vs DuckDB TRUE) — asserted below
  * too, so the registry form and this bound can't drift apart.
  */
class ApproxBoundSpec extends AnyFunSuite with SparkTestBase {

  private def check(dir: String): Unit = {
    val exact = SparkEntry.queries("order_stats")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = graft.queries.ExtraQueries.orderStatsApproxRaw(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(exact.keySet == approx.keySet, "group sets diverge")
    exact.foreach { case (flag, (nOrders, nParts, nRows)) =>
      val (aOrders, aParts, aRows) = approx(flag)
      assert(aRows == nRows, s"$flag: exact row counts must be identical")
      val errOrders = math.abs(aOrders - nOrders).toDouble / nOrders
      val errParts = math.abs(aParts - nParts).toDouble / nParts
      assert(errOrders <= 0.05,
        s"$flag: approx_orders off by ${errOrders * 100}% ($aOrders vs $nOrders)")
      assert(errParts <= 0.05,
        s"$flag: approx_parts off by ${errParts * 100}% ($aParts vs $nParts)")
    }
  }

  test("order_stats_approx within 5% of the exact twin at sf0.01") {
    check("/root/testdata/sf0.01")
  }

  test("order_stats_approx within 5% of the exact twin at sf0.1") {
    check("/root/testdata/sf0.1")
  }

  test("registered order_stats_approx self-check booleans are all true") {
    val rows = SparkEntry.queries("order_stats_approx")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"${r.getString(0)}: estimator out of bound — ${r.mkString(",")}")
    }
  }

  // The scale path for quantiles is percentile_approx (single-pass
  // KLL-style sketch vs exact percentile's full sort+buffer); bound it
  // against the exact price_quantiles twin the same way.
  private def checkQuantiles(dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("price_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val t = graft.ops.TickOps.normalizeEvents(Tables.events(spark, dir))
    val approx = t.groupBy(col("symbol"))
      .agg(expr("percentile_approx(price, array(0.25, 0.5, 0.95), 10000)")
        .as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (sym, (p25, p50, p95)) =>
      Seq(p25, p50, p95).zip(approx(sym)).foreach { case (e, a) =>
        assert(math.abs(a - e) / math.max(e.abs, 1e-9) <= 0.05,
          s"$sym: approx quantile $a vs exact $e")
      }
    }
  }

  test("percentile_approx within 5% of exact quantiles at sf0.01") {
    checkQuantiles("/root/testdata/sf0.01")
  }

  test("percentile_approx within 5% of exact quantiles at sf0.1") {
    checkQuantiles("/root/testdata/sf0.1")
  }
}
