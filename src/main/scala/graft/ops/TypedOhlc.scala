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

  final case class Tick(symbol: String, ts_us: Long, price: Double)
  final case class OhlcBuf(openTs: Long, open: Double, high: Double,
                           low: Double, closeTs: Long, close: Double,
                           n: Long)
  final case class Ohlc(open: Double, high: Double, low: Double,
                        close: Double, n_ticks: Long)

  object OhlcAggregator extends Aggregator[Tick, OhlcBuf, Ohlc] {
    override def zero: OhlcBuf =
      OhlcBuf(Long.MaxValue, 0.0, Double.MinValue, Double.MaxValue,
        Long.MinValue, 0.0, 0L)
    override def reduce(b: OhlcBuf, t: Tick): OhlcBuf = OhlcBuf(
      openTs = math.min(b.openTs, t.ts_us),
      open = if (t.ts_us < b.openTs) t.price else b.open,
      high = math.max(b.high, t.price),
      low = math.min(b.low, t.price),
      closeTs = math.max(b.closeTs, t.ts_us),
      close = if (t.ts_us > b.closeTs) t.price else b.close,
      n = b.n + 1)
    override def merge(x: OhlcBuf, y: OhlcBuf): OhlcBuf = OhlcBuf(
      openTs = math.min(x.openTs, y.openTs),
      open = if (y.openTs < x.openTs) y.open else x.open,
      high = math.max(x.high, y.high),
      low = math.min(x.low, y.low),
      closeTs = math.max(x.closeTs, y.closeTs),
      close = if (y.closeTs > x.closeTs) y.close else x.close,
      n = x.n + y.n)
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
        col("price"))
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
