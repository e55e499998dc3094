package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed-Dataset OHLC: the reference's daily multi-agg (A1) as a custom
  * `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.10 U3 — the optional typed
  * twin of the min_by/max_by built-ins).
  *
  * Demonstrates the `Dataset[T]`/`Encoder` surface; the untyped
  * [[TickOps.dailyOhlc]] remains the scale-preferred form (codegen'd
  * built-ins), and both must produce identical results — which the shared
  * DuckDB oracle enforces.
  */
object TypedOhlc {

  final case class Tick(symbol: String, ts_us: Long, price: Double,
                        event_id: Long)
  final case class OhlcBuf(openTs: Long, openId: Long, open: Double,
                           high: Double, low: Double,
                           closeTs: Long, closeId: Long, close: Double,
                           n: Long)
  final case class Ohlc(open: Double, high: Double, low: Double,
                        close: Double, n_ticks: Long)

  // (ts, id) lexicographic compare — the typed twin of
  // Determinism.tsTieKey: same-timestamp ticks tie-break on the unique
  // event id, matching the untyped min_by/max_by key and the oracle
  private def lt(ts1: Long, id1: Long, ts2: Long, id2: Long): Boolean =
    ts1 < ts2 || (ts1 == ts2 && id1 < id2)

  object OhlcAggregator extends Aggregator[Tick, OhlcBuf, Ohlc] {
    override def zero: OhlcBuf =
      OhlcBuf(Long.MaxValue, Long.MaxValue, 0.0,
        Double.MinValue, Double.MaxValue,
        Long.MinValue, Long.MinValue, 0.0, 0L)
    override def reduce(b: OhlcBuf, t: Tick): OhlcBuf = {
      val opens = lt(t.ts_us, t.event_id, b.openTs, b.openId)
      val closes = lt(b.closeTs, b.closeId, t.ts_us, t.event_id)
      OhlcBuf(
        openTs = if (opens) t.ts_us else b.openTs,
        openId = if (opens) t.event_id else b.openId,
        open = if (opens) t.price else b.open,
        high = math.max(b.high, t.price),
        low = math.min(b.low, t.price),
        closeTs = if (closes) t.ts_us else b.closeTs,
        closeId = if (closes) t.event_id else b.closeId,
        close = if (closes) t.price else b.close,
        n = b.n + 1)
    }
    override def merge(x: OhlcBuf, y: OhlcBuf): OhlcBuf = {
      val opens = lt(y.openTs, y.openId, x.openTs, x.openId)
      val closes = lt(x.closeTs, x.closeId, y.closeTs, y.closeId)
      OhlcBuf(
        openTs = if (opens) y.openTs else x.openTs,
        openId = if (opens) y.openId else x.openId,
        open = if (opens) y.open else x.open,
        high = math.max(x.high, y.high),
        low = math.min(x.low, y.low),
        closeTs = if (closes) y.closeTs else x.closeTs,
        closeId = if (closes) y.closeId else x.closeId,
        close = if (closes) y.close else x.close,
        n = x.n + y.n)
    }
    override def finish(b: OhlcBuf): Ohlc =
      Ohlc(b.open, b.high, b.low, b.close, b.n)
    override def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
    override def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
  }

  /** Daily OHLC through the typed path: normalize → Dataset[Tick] →
    * groupByKey((date, symbol)) → custom Aggregator. */
  def dailyOhlcTyped(normalized: DataFrame): DataFrame = {
    val spark: SparkSession = normalized.sparkSession
    import spark.implicits._
    val ticks = normalized.select(
        col("symbol"),
        unix_micros(col("event_ts")).as("ts_us"),
        col("price"),
        col("event_id"))
      .as[Tick]
    ticks
      .groupByKey(t => (epochUsToDate(t.ts_us), t.symbol))
      .agg(OhlcAggregator.toColumn.name("ohlc"))
      .map { case ((d, sym), o) =>
        (d, sym, o.open, o.high, o.low, o.close, o.n_ticks)
      }
      .toDF("trade_date_s", "symbol", "open", "high", "low", "close", "n_ticks")
      .select(to_date(col("trade_date_s")).as("trade_date"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"), col("n_ticks"))
  }

  /** UTC calendar date of an epoch-microsecond instant (session TZ is
    * pinned UTC everywhere — build.sbt). */
  private def epochUsToDate(us: Long): String =
    java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L))
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
}
