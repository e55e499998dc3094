package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for ANSI-mode division edges: Spark 4 throws
  * DIVIDE_BY_ZERO even for doubles (probed empirically), so every ratio
  * the financial queries expose must be nullif/clamp-guarded. This spec
  * runs those queries against a crafted fixture containing exactly the
  * degenerate shapes: a constant-price symbol (sd = 0), a symbol whose
  * first/peak price is 0.0, and a symbol-day whose ticks all share one
  * timestamp (total duration 0).
  */
class DegenerateInputSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("graft_degenerate").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(offsetS: Long) = new java.sql.Timestamp(base.getTime + offsetS * 1000)
    val rows =
      // FLAT: constant price -> variance 0, sd 0
      (1L to 20L).map(i => (i, ts(i), i, "FLAT.NSE", 50.0, """{"k":"1"}""")) ++
      // ZERO: first (and running-max) price is 0.0
      Seq((100L, ts(1), 1L, "ZERO.NSE", 0.0, """{"k":"1"}"""),
        (101L, ts(2), 1L, "ZERO.NSE", 10.0, """{"k":"1"}""")) ++
      // TIED: all ticks of the day at ONE timestamp -> total duration 0
      (200L to 204L).map(i => (i, ts(0), i, "TIED.NSE", 7.0 + i, """{"k":"2"}""")) ++
      // LONE: exactly one priced tick -> n - 1 = 0 in sample-variance
      Seq((300L, ts(1), 1L, "LONE.NSE", 42.0, """{"k":"1"}""")) ++
      // TWOD: one tick on each of two days -> exactly ONE daily return
      // row, so daily_volatility's (n - 1) denominator is 0
      Seq((400L, ts(1), 1L, "TWOD.NSE", 10.0, """{"k":"1"}"""),
        (401L, ts(86400), 1L, "TWOD.NSE", 11.0, """{"k":"1"}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("events_anomaly survives a constant-price symbol (sd = 0)") {
    val out = SparkEntry.queries("events_anomaly")(spark, dir).collect()
    assert(!out.exists(_.getString(0) == "FLAT"),
      "constant-price symbol must produce no anomalies, not a crash")
  }

  test("events_anomaly and daily_volatility survive a single-tick symbol (n - 1 = 0)") {
    val anom = SparkEntry.queries("events_anomaly")(spark, dir).collect()
    assert(!anom.exists(_.getString(0) == "LONE"),
      "single-tick symbol must produce no anomalies, not an ANSI divide crash")
    val vol = SparkEntry.queries("daily_volatility")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // TWOD: two trade dates -> exactly one return row -> n - 1 = 0;
    // the nullif guard yields a null vol instead of an ANSI crash
    assert(vol.contains("TWOD"), "single-return symbol still reported")
    assert(vol("TWOD").getLong(1) == 1L && vol("TWOD").isNullAt(3),
      "one return row: mean present, vol null")
    assert(!vol.contains("LONE"), "zero-return symbol has no group")
  }

  test("max_drawdown and cum_return survive a 0.0 first/peak price") {
    val dd = SparkEntry.queries("max_drawdown")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(dd.contains("ZERO"), "symbol still reported")
    val cr = SparkEntry.queries("cum_return")(spark, dir)
      .filter(col("symbol") === "ZERO").collect()
    assert(cr.length == 2 && cr.forall(_.isNullAt(4)),
      "returns against a zero basis are null, not an error")
  }

  test("twap_daily yields null (not a crash) for an all-tied-timestamp day") {
    val tw = SparkEntry.queries("twap_daily")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(tw("TIED").isNullAt(2) || tw("TIED").getLong(2) == 5L)
    assert(tw("TIED").isNullAt(3), "zero total duration -> null twap")
  }

  test("rsi_14 emits no row for flat frames' undefined ratio (G+L=0)") {
    // FLAT has 20 ticks -> rows with rn >= 15 exist, every delta is 0,
    // so sg + sl = 0: the nullif guard must keep the query alive and the
    // rsi column null
    val out = SparkEntry.queries("rsi_14")(spark, dir)
      .filter(col("symbol") === "FLAT").collect()
    assert(out.length == 6 && out.forall(_.isNullAt(4)),
      "flat symbol: rows present, RSI null")
  }
}
