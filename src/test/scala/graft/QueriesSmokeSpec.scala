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

  test("streaming stateful sessionization: closed sessions equal batch minus open tails") {
    import org.apache.spark.sql.functions._
    val closed = graft.ops.SessionOps
      .sessionizeStreamAvailableNow(spark, sf, 30, "smoke_sessions")
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
    val batch = graft.ops.SessionOps.sessionize(Tables.events(spark, sf), 30)
    // a user's LAST session is still open in the stream (no event-time
    // timeout fired) — everything before it must match exactly
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_seq").desc)
    val batchClosed = batch
      .withColumn("rn", row_number().over(w)).filter(col("rn") > 1)
      .select(col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"), col("n_events"))
    assert(closed.count() > 0)
    assert(closed.except(batchClosed).isEmpty && batchClosed.except(closed).isEmpty)
  }

  test("streaming foreachBatch QC sinks mirror the batch reports") {
    import org.apache.spark.sql.functions._
    val work = java.nio.file.Files
      .createTempDirectory("graft_stream_qc").toString
    val (_, summaryDir) = graft.streaming.StreamingQc
      .runAvailableNow(spark, sf, work)
    val summary = spark.read.parquet(summaryDir)
      .groupBy(col("symbol"))
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("n_invalid")).as("n_invalid"))
    val batch = graft.ops.QualityOps.invalidSummary(
      graft.ops.TickOps.normalizeEvents(Tables.events(spark, sf)),
      Seq("price", "qty", "trader_id"), "symbol")
    assert(summary.except(batch).isEmpty && batch.except(summary).isEmpty)
  }

  test("every oracled query has matching column conventions") {
    // oracle keys ⊆ query keys; no oracle without a query
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }
}
