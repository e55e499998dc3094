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

  test("compaction collapses a fragmented table into right-sized files, row-identical") {
    val frag = s"${System.getProperty("java.io.tmpdir")}/graft_wh_frag"
    val tidy = s"${System.getProperty("java.io.tmpdir")}/graft_wh_tidy"
    deleteRec(frag); deleteRec(tidy)
    val ticks = TickOps.normalizeEvents(Tables.events(spark, sf))
      .withColumn("trade_date", to_date(col("event_ts")))
    // simulate streaming ingest: ~40 task-files per date partition
    ticks.repartition(40)
      .write.partitionBy("trade_date").parquet(frag)
    val fragFiles = WarehouseOps.fileStats(spark, frag).count()

    val maxRows = 500L
    WarehouseOps.compactPartitions(spark, frag, tidy,
      maxRecordsPerFile = maxRows)

    // row-identical content (same multiset of rows)
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(tidy).select(a.columns.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "compaction must not change table content")
    // every output file respects the size bound, and each partition has
    // exactly ceil(rows/max) files — no small-files tail
    val stats = WarehouseOps.fileStats(spark, tidy).collect()
    assert(stats.forall(_.getLong(1) <= maxRows), "file size bound")
    val perDate = stats.groupBy(r =>
      r.getString(0).split("trade_date=")(1).split("/")(0))
    val rowsPerDate = b.groupBy("trade_date").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    perDate.foreach { case (d, files) =>
      val want = (rowsPerDate(d) + maxRows - 1) / maxRows
      assert(files.length == want,
        s"partition $d: ${files.length} files, expected $want")
    }
    assert(stats.length < fragFiles,
      "compaction must reduce the file count")
  }

  test("byte-targeted compaction fails loudly on an empty source table") {
    // sum() over zero rows is NULL — without the guard this was an
    // opaque NullPointerException from getLong
    val empty = s"${System.getProperty("java.io.tmpdir")}/graft_wh_empty"
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_wh_empty_out"
    deleteRec(empty); deleteRec(out)
    TickOps.normalizeEvents(Tables.events(spark, sf))
      .withColumn("trade_date", to_date(col("event_ts")))
      .limit(0).write.parquet(empty)
    val e = intercept[IllegalArgumentException] {
      WarehouseOps.compactPartitionsToBytes(spark, empty, out)
    }
    assert(e.getMessage.contains("empty"), e.getMessage)
  }

  test("byte-targeted compaction derives a sane record bound and lands files near target") {
    val frag = s"${System.getProperty("java.io.tmpdir")}/graft_wh_bfrag"
    val tidy = s"${System.getProperty("java.io.tmpdir")}/graft_wh_btidy"
    deleteRec(frag); deleteRec(tidy)
    val ticks = TickOps.normalizeEvents(Tables.events(spark, sf))
      .withColumn("trade_date", to_date(col("event_ts")))
    ticks.repartition(40)
      .write.partitionBy("trade_date").parquet(frag)

    val target = 32L << 10 // 32 KiB — small enough to force splits here
    val bound = WarehouseOps.compactPartitionsToBytes(
      spark, frag, tidy, targetBytesPerFile = target)

    // the derived record bound is target / avgRowBytes, recomputed here
    // from the same metadata the op reads
    val src = WarehouseOps.fileSizeStats(spark, frag)
      .agg(sum(col("bytes")).as("b"), sum(col("n_rows")).as("r")).head()
    val avgRowBytes = math.max(1.0,
      src.getLong(0).toDouble / math.max(1L, src.getLong(1)))
    assert(bound == math.max(1L, (target / avgRowBytes).toLong),
      s"record bound $bound disagrees with the documented formula")
    assert(bound > 0)

    // content-preserving
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(tidy).select(a.columns.map(col): _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "byte-targeted compaction must not change table content")

    // every output file respects the derived record bound, and —
    // because the source's avgRowBytes over-estimates consolidated
    // width (footer overhead on 40-way fragments, dictionary gains on
    // merged files) — no output file exceeds the byte target with slack
    val stats = WarehouseOps.fileSizeStats(spark, tidy).collect()
    assert(stats.forall(_.getLong(1) <= bound), "record bound violated")
    assert(stats.forall(_.getLong(2) <= target * 2),
      s"an output file exceeds 2x the byte target: " +
        stats.map(_.getLong(2)).max.toString)
  }
}
