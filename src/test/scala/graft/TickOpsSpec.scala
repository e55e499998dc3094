package graft

import graft.ops.{QualityOps, TickOps, TypedOhlc}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the tick-domain operators on crafted fixtures covering
  * the SURVEY.md semantic traps: coercion-to-null (P3), global suffix
  * strip (P1), null/negative QC predicate (P6), order-independent
  * open/close (A1), full-frame close intent (W2), one-sided pivot groups
  * (A3), and typed-vs-untyped OHLC agreement (U3).
  */
class TickOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val crafted = Seq(
    // symbol, ts, price, trader, qty, id
    ("ACME.NSE", ts("2024-01-01 09:00:01"), 100.0, 1L, 5.0, 1L),
    ("ACME.NSE", ts("2024-01-01 09:59:59"), 110.0, 2L, 1.0, 2L),
    ("ACME.NSE", ts("2024-01-01 09:30:00"), 90.0, 3L, 2.0, 3L),
    ("ACME.NSE", ts("2024-01-02 10:00:00"), 120.0, 4L, 3.0, 4L),
    ("BETA", ts("2024-01-01 09:10:00"), 50.0, 5L, -1.0, 5L), // negative qty
    ("BETA", ts("2024-01-02 09:20:00"), 55.0, 6L, Double.NaN, 6L)
  ).toDF("symbol", "event_ts", "price", "trader_id", "qty", "event_id")
    .withColumn("qty", when(isnan(col("qty")), lit(null)).otherwise(col("qty")))

  test("P1: suffix strip removes ALL occurrences (reference semantics)") {
    val df = Seq("X.NSE", "A.NSEB.NSE", "PLAIN").toDF("s")
      .select(TickOps.stripSuffix(col("s")).as("out"))
    assert(df.as[String].collect().toSeq == Seq("X", "AB", "PLAIN"))
  }

  test("P3: numeric coercion turns junk into null, like to_numeric(coerce)") {
    val df = Seq("1.5", "junk", "", "-2").toDF("v")
      .select(TickOps.coerceDouble(col("v")).as("d"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.5), None, None, Some(-2.0)))
  }

  test("P6: invalid predicate fires on null OR negative, any column") {
    val invalid = TickOps.invalidRows(crafted, Seq("price", "qty", "trader_id"))
    assert(invalid.select("event_id").as[Long].collect().toSet == Set(5L, 6L))
    val valid = TickOps.validRows(crafted, Seq("price", "qty", "trader_id"))
    // QC filter partitions the input: valid ∪ invalid = all
    assert(valid.count() + invalid.count() == crafted.count())
  }

  test("A1: daily OHLC open/close are timestamp-deterministic, not row-order") {
    val shuffled = crafted.orderBy(rand(42)) // destroy input order
    val ohlc = TickOps.dailyOhlc(shuffled)
      .filter(col("symbol") === "ACME.NSE" && col("trade_date") === "2024-01-01")
      .collect().head
    assert(ohlc.getAs[Double]("open") == 100.0)  // earliest ts
    assert(ohlc.getAs[Double]("high") == 110.0)
    assert(ohlc.getAs[Double]("low") == 90.0)
    assert(ohlc.getAs[Double]("close") == 110.0) // latest ts, NOT last row
  }

  test("W2: hourly MV close uses the full frame (reference's intent)") {
    val mv = TickOps.hourlyOhlcMv(crafted)
      .filter(col("symbol") === "ACME.NSE" &&
        col("bar_hour") === ts("2024-01-01 09:00:00"))
      .collect().head
    // with the reference's literal RANGE-default frame this would be the
    // current row's price; the intent (documented bug W2) is the latest
    assert(mv.getAs[Double]("close") == 110.0)
    assert(mv.getAs[Double]("open") == 100.0)
  }

  test("A3: symbol present on only one of two days yields null → filtered") {
    val pc = TickOps.priceChangePct(crafted, "2024-01-01", "2024-01-02", 0.0)
    // BETA has qty issues but prices on both days; ACME on both days too.
    // Drop BETA's day-2 row to make it one-sided:
    val oneSided = crafted.filter(!(col("symbol") === "BETA" &&
      to_date(col("event_ts")) === "2024-01-02"))
    val pc2 = TickOps.priceChangePct(oneSided, "2024-01-01", "2024-01-02", 0.0)
    assert(pc.select("symbol").as[String].collect().toSet == Set("ACME.NSE", "BETA"))
    assert(pc2.select("symbol").as[String].collect().toSet == Set("ACME.NSE"))
  }

  test("OHLC invariants: low <= open, close <= high; bars roll up exactly") {
    val hourly = TickOps.ohlcBars(crafted, "1 hour")
    hourly.collect().foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
    // 5-minute bars re-aggregated over the hour = the hourly bar
    val five = TickOps.ohlcBars(crafted, "5 minutes")
    val rolled = five.groupBy(date_trunc("hour", col("bar_start")).as("h"),
        col("symbol"))
      .agg(min_by(col("open"), col("bar_start")).as("open"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        max_by(col("close"), col("bar_start")).as("close"),
        sum(col("n_ticks")).as("n_ticks"))
    val direct = hourly.select(col("bar_start").as("h"), col("symbol"),
      col("open"), col("high"), col("low"), col("close"), col("n_ticks"))
    assert(rolled.except(direct).isEmpty && direct.except(rolled).isEmpty)
  }

  test("U3: typed Aggregator OHLC equals the untyped min_by/max_by plan") {
    val untyped = TickOps.dailyOhlc(crafted)
      .select("trade_date", "symbol", "open", "high", "low", "close", "n_ticks")
    val typed = TypedOhlc.dailyOhlcTyped(crafted)
    assert(typed.except(untyped).isEmpty && untyped.except(typed).isEmpty)
  }

  test("as-of join picks the latest tick at-or-before each probe, per key") {
    val ticks = Seq(
      ("A", ts("2024-01-01 09:00:00"), 10.0),
      ("A", ts("2024-01-01 09:30:00"), 11.0),
      ("A", ts("2024-01-01 11:00:00"), 12.0),
      ("B", ts("2024-01-01 10:15:00"), 99.0)
    ).toDF("symbol", "event_ts", "price")
    val probes = Seq(
      ("A", ts("2024-01-01 08:00:00")), // before any tick → dropped
      ("A", ts("2024-01-01 09:30:00")), // exactly at a tick → that tick
      ("A", ts("2024-01-01 10:00:00")), // between ticks → 09:30 tick
      ("B", ts("2024-01-01 12:00:00"))
    ).toDF("symbol", "event_ts")
    val out = ops.AsOfOps.asofJoin(ticks, probes, "symbol", "event_ts", "price")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString) ->
        r.getAs[Double]("asof_value")).toMap
    assert(out.size == 3)
    assert(out(("A", "2024-01-01 09:30:00.0")) == 11.0)
    assert(out(("A", "2024-01-01 10:00:00.0")) == 11.0)
    assert(out(("B", "2024-01-01 12:00:00.0")) == 99.0)
  }

  test("native as-of exec equals the composed union-window form") {
    val ticks = Seq(
      ("A", ts("2024-01-01 09:00:00"), 10.0),
      ("A", ts("2024-01-01 09:30:00"), 11.0),
      ("A", ts("2024-01-01 11:00:00"), 12.0),
      ("B", ts("2024-01-01 10:15:00"), 99.0),
      ("C", ts("2024-01-01 01:00:00"), 5.0)
    ).toDF("symbol", "event_ts", "price")
    val probes = Seq(
      ("A", ts("2024-01-01 08:00:00")),
      ("A", ts("2024-01-01 09:30:00")),
      ("A", ts("2024-01-01 10:00:00")),
      ("A", ts("2024-01-01 23:00:00")),
      ("B", ts("2024-01-01 12:00:00")),
      ("Z", ts("2024-01-01 12:00:00")) // key with no ticks at all
    ).toDF("symbol", "event_ts")
    val composed = ops.AsOfOps.asofJoin(ticks, probes, "symbol", "event_ts", "price")
    val native = ops.AsOfOps.asofJoinNative(ticks, probes, "symbol", "event_ts", "price")
    assert(native.count() == 4) // A@08:00 (no prior tick) and Z (no ticks) drop
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }

  test("as-of join drops null keys/timestamps identically on both paths") {
    val ticks = Seq(
      (Some("A"), Some(ts("2024-01-01 09:00:00")), Some(10.0)),
      (None, Some(ts("2024-01-01 09:10:00")), Some(66.0)), // null key
      (Some("A"), None, Some(77.0)),                        // null ts
      (Some("A"), Some(ts("2024-01-01 09:30:00")), None),   // null value
      (Some("B"), Some(ts("2024-01-01 10:15:00")), Some(99.0))
    ).toDF("symbol", "event_ts", "price")
    val probes = Seq(
      (Some("A"), Some(ts("2024-01-01 10:00:00"))),
      (None, Some(ts("2024-01-01 10:00:00"))), // null key probe
      (Some("B"), None),                        // null ts probe
      (Some("B"), Some(ts("2024-01-01 12:00:00")))
    ).toDF("symbol", "event_ts")
    val composed = ops.AsOfOps.asofJoin(ticks, probes, "symbol", "event_ts", "price")
    val native = ops.AsOfOps.asofJoinNative(ticks, probes, "symbol", "event_ts", "price")
    // null-key/ts rows never match under inner as-of: only the two clean
    // probes survive, and the null-value 09:30 tick is not an answer
    val out = native.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("asof_value")).toMap
    assert(out == Map("A" -> 10.0, "B" -> 99.0))
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }

  test("native as-of handles self-join lineage (shared exprIds re-aliased)") {
    val base = Seq(
      ("A", ts("2024-01-01 09:00:00"), 10.0),
      ("A", ts("2024-01-01 09:30:00"), 11.0),
      ("B", ts("2024-01-01 10:15:00"), 99.0)
    ).toDF("symbol", "event_ts", "price")
    // probes derived from the SAME DataFrame: sides share exprIds unless
    // the native path re-aliases the tick side
    val probes = base.select("symbol", "event_ts")
    val native = ops.AsOfOps.asofJoinNative(base, probes, "symbol", "event_ts", "price")
    val composed = ops.AsOfOps.asofJoin(base, probes, "symbol", "event_ts", "price")
    assert(native.count() == 3) // every probe sits exactly on its own tick
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }

  test("salted aggregation equals the direct groupBy exactly") {
    val df = crafted.select(col("symbol"), col("price"))
    val salted = ops.RelationalOps.saltedAgg(df, "symbol", "price", 4)
    val direct = df.groupBy(col("symbol")).agg(
      ops.Determinism.exactSum(col("price")).as("sum_value"),
      count(lit(1)).as("n_rows"),
      min(col("price")).as("min_value"),
      max(col("price")).as("max_value"))
    assert(salted.except(direct).isEmpty && direct.except(salted).isEmpty)
  }

  test("gap-filled bars carry the previous close across silent hours") {
    val q = SparkEntry.queries("ohlc_gapfill")
    // crafted: symbol with ticks at 09:xx and 12:xx only → 10:00, 11:00
    // are gap rows that must carry the 09:00 bar's close
    val df = q(spark, "/root/testdata/sf0.001")
    val row = df.filter(col("symbol") === "click").orderBy("bar_start").collect()
    assert(row.nonEmpty)
    // every row has a non-null forward-filled close and the traded flag
    row.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("close_ffill")))
    }
    // gap rows exist at sf0.001 (sparse hours) and are marked untraded
    assert(row.exists(r => !r.getAs[Boolean]("traded")))
  }

  test("tfidf ranks rarer terms above ubiquitous ones") {
    val out = SparkEntry.queries("tfidf_top_terms")(spark, "/root/testdata/sf0.001")
    val byDoc = out.collect().groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.values.foreach { rows =>
      assert(rows.length <= 3)
      // within a doc, rank order must follow tfidf descending
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("J2: missing keys = universe minus observed, subset of universe") {
    val universe = Seq("A", "B", "C", "D").toDF("sym")
    val observed = Seq("B", "D", "E").toDF("obs")
    val missing = QualityOps.missingKeys(universe, "sym", observed, "obs")
    assert(missing.as[String].collect().toSet == Set("A", "C"))
  }

  test("reconcile: identical aggregates diff to zero") {
    val daily = TickOps.dailyOhlc(crafted)
    val recon = QualityOps.reconcile(daily, daily, Seq("trade_date", "symbol"))
    recon.collect().foreach { r =>
      Seq("open_diff", "high_diff", "low_diff", "close_diff")
        .foreach(c => assert(r.getAs[Double](c) == 0.0))
    }
  }
}
