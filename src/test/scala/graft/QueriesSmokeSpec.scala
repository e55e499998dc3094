package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs against the smallest fixture and returns
  * a sane schema; queries with planted expectations return rows. Keeps
  * the full registry executable as a unit (the DuckDB value check is the
  * driver's Verify/check gate).
  */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // streaming + pipeline queries have their own slower paths; smoke the
  // rest here and those two in dedicated tests below.
  private val slow = Set("streaming_ohlc_hourly", "pipeline_e2e")

  SparkEntry.registry.filterNot(q => slow(q.name)).foreach { q =>
    test(s"query ${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry: flagship query returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("streaming twin matches the batch hourly bars exactly") {
    val stream = graft.streaming.StreamingOhlc
      .hourlyOhlcAvailableNow(spark, sf, "smoke_stream")
    val batch = SparkEntry.queries("ohlc_hourly")(spark, sf)
    assert(stream.count() > 0)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("pipeline E2E produces consistent stage counts") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_pipe_test").toString
    val r = graft.pipeline.Pipeline.runDaily(spark, sf, work)
    assert(r.warehouseRows == 1000L)
    assert(r.csvRoundtripRows == 1000L)
    assert(r.invalidRows == 0L)
    assert(r.missingSymbols == 1L) // the planted GHOST symbol
    assert(r.partitions == 30L)    // one per trading day in January
    assert(r.hourlyBars > 0L && r.reconcileRows > 0L)
  }

  test("every oracled query has matching column conventions") {
    // oracle keys ⊆ query keys; no oracle without a query
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }
}
