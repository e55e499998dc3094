package graft

import graft.ops.TickOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Associativity of the OHLC partial-state merge: ANY split of the tick
  * stream — including splits inside a bar — must merge to the bars a
  * full recompute produces. This is the algebraic property incremental
  * MV refresh rests on.
  */
class MvMergeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val ticks = Seq(
    ("A", "2024-01-01 10:05:00", 10.0),
    ("A", "2024-01-01 10:20:00", 12.0),
    ("A", "2024-01-01 10:40:00", 8.0),
    ("A", "2024-01-01 11:10:00", 9.0),
    ("B", "2024-01-01 10:15:00", 100.0),
    ("B", "2024-01-01 10:45:00", 95.0)
  ).toDF("symbol", "ts", "price")
    .select($"symbol", to_timestamp($"ts").as("event_ts"), $"price")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("bar_start", "symbol").collect().toSeq

  test("mid-bar split merges to the full recompute (open/close re-derived)") {
    val full = TickOps.ohlcBars(ticks, "1 hour")
      .withColumn("n_ticks", $"n_ticks") // same schema, no-op
    val split = to_timestamp(lit("2024-01-01 10:30:00"))
    val merged = TickOps.ohlcMerge(
      TickOps.ohlcPartial(ticks.filter($"event_ts" < split), "1 hour")
        .unionByName(
          TickOps.ohlcPartial(ticks.filter($"event_ts" >= split), "1 hour")))
    assert(canon(merged) == canon(full))
    // the 10:00 A bar genuinely straddles: open from the first partial
    // (10.0 at 10:05), close from the second (8.0 at 10:40)
    val bar = merged.filter($"symbol" === "A" &&
      $"bar_start" === to_timestamp(lit("2024-01-01 10:00:00"))).head()
    assert(bar.getAs[Double]("open") == 10.0)
    assert(bar.getAs[Double]("close") == 8.0)
    assert(bar.getAs[Long]("n_ticks") == 3L)
  }

  test("three-way uneven split merges identically (associativity)") {
    val full = TickOps.ohlcBars(ticks, "1 hour")
    val s1 = to_timestamp(lit("2024-01-01 10:10:00"))
    val s2 = to_timestamp(lit("2024-01-01 10:44:00"))
    val merged = TickOps.ohlcMerge(
      TickOps.ohlcPartial(ticks.filter($"event_ts" < s1), "1 hour")
        .unionByName(TickOps.ohlcPartial(
          ticks.filter($"event_ts" >= s1 && $"event_ts" < s2), "1 hour"))
        .unionByName(
          TickOps.ohlcPartial(ticks.filter($"event_ts" >= s2), "1 hour")))
    assert(canon(merged) == canon(full))
  }
}
