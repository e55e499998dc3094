package graft

import graft.ops.WarehouseOps
import org.scalatest.funsuite.AnyFunSuite

/** The literal external-warehouse (JDBC) sink, exercised against an
  * in-process in-memory Derby database — the same engine the session
  * catalog's metastore embeds, so no external service is required.
  * Covers the reference's `to_sql(if_exists='append')` semantics:
  * first append creates the table, later appends accumulate.
  */
class JdbcSinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_jdbc;create=true"
  private def props = new java.util.Properties()

  test("appendJdbc creates on first append and accumulates on the next") {
    val df = Seq((1L, "RELIANCE", 2850.5), (2L, "TCS", 4100.0))
      .toDF("id", "symbol", "price")
    WarehouseOps.appendJdbc(df, url, "ticks_out")
    assert(spark.read.jdbc(url, "ticks_out", props).count() == 2)
    WarehouseOps.appendJdbc(df, url, "ticks_out")
    val back = spark.read.jdbc(url, "ticks_out", props)
    assert(back.count() == 4, "append must accumulate, not overwrite")
    val bySym = back.groupBy("symbol").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySym == Map("RELIANCE" -> 2L, "TCS" -> 2L))
    // values round-trip through the external database intact
    val price = back.filter($"id" === 1L).select("price")
      .collect().map(_.getDouble(0)).toSet
    assert(price == Set(2850.5))
  }

  test("a real engine frame lands in the external warehouse") {
    val daily = graft.ops.TickOps.dailyOhlc(
      graft.ops.TickOps.normalizeEvents(
        Tables.events(spark, "/root/testdata/sf0.001")))
    WarehouseOps.appendJdbc(daily, url, "daily_ohlc_out")
    val back = spark.read.jdbc(url, "daily_ohlc_out", props)
    assert(back.count() == daily.count())
    assert(back.columns.sorted.sameElements(daily.columns.sorted))
  }
}
