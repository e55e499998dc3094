package graft

import graft.ops.{TickOps, WarehouseOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition overwrite: a daily refresh must rewrite ONLY the
  * refreshed dates' partitions — untouched dates keep their files.
  */
class WarehouseSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def deleteRec(dir: String): Unit = graft.util.Fs.deleteRec(dir)

  private def partFiles(root: String): Map[String, Set[(String, Long)]] =
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("trade_date="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet)
      .toMap

  test("dynamic partition refresh touches only the incoming dates") {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_wh_refresh"
    deleteRec(wh)
    val ticks = TickOps.normalizeEvents(Tables.events(spark, sf))
      .withColumn("trade_date", to_date(col("event_ts")))

    // initial full load
    WarehouseOps.refreshPartitions(ticks, wh)
    val before = partFiles(wh)
    assert(before.size > 2, s"fixture spans ${before.size} dates — too few")

    // day-2 refresh: one date, prices doubled (so the change is visible)
    val dates = before.keys.toSeq.sorted
    val refreshDate = dates(1).stripPrefix("trade_date=")
    val updated = ticks.filter(col("trade_date") === lit(refreshDate))
      .withColumn("price", col("price") * 2)
    Thread.sleep(1100) // modtime resolution
    WarehouseOps.refreshPartitions(updated, wh)
    val after = partFiles(wh)

    // untouched dates: identical file sets (names AND modtimes)
    dates.filterNot(_ == s"trade_date=$refreshDate").foreach { d =>
      assert(after(d) == before(d), s"partition $d was rewritten")
    }
    // refreshed date: new files, and the doubled prices landed
    assert(after(s"trade_date=$refreshDate") != before(s"trade_date=$refreshDate"))
    val reread = spark.read.parquet(wh)
    val origDay = ticks.filter(col("trade_date") === lit(refreshDate))
    val newDay = reread.filter(col("trade_date") === lit(refreshDate))
    assert(newDay.count() == origDay.count())
    val origSum = origDay.agg(sum("price")).first().getDouble(0)
    val newSum = newDay.agg(sum("price")).first().getDouble(0)
    assert(math.abs(newSum - 2 * origSum) < 1e-6)
    // the rest of the table is unchanged
    assert(reread.count() == ticks.count())
  }

  test("refresh with an empty frame is a no-op (no partitions dropped)") {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_wh_empty"
    graft.util.Fs.deleteRec(wh)
    val ticks = TickOps.normalizeEvents(Tables.events(spark, sf))
      .withColumn("trade_date", to_date(col("event_ts")))
    WarehouseOps.refreshPartitions(ticks, wh)
    val before = spark.read.parquet(wh).count()
    WarehouseOps.refreshPartitions(ticks.filter(lit(false)), wh)
    assert(spark.read.parquet(wh).count() == before,
      "an empty refresh must not touch existing partitions")
  }
}
