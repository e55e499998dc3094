package graft

import graft.ops.TickOps
import graft.streaming.StreamingOhlc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PRODUCTION streaming sink path: append-mode parquet files with a
  * durable checkpoint (the memory sink is only the harness adapter).
  * Append mode finalizes a bar when the watermark passes its window end,
  * so the file sink must contain exactly batch-identical bars for every
  * watermark-closed window; trailing open bars stay in state.
  */
class StreamingSinkSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def deleteRec(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val it = java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator()
      while (it.hasNext) java.nio.file.Files.delete(it.next())
    }
  }

  test("file sink emits watermark-closed bars identical to the batch twin") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_stream_files"
    deleteRec(out)
    val path = StreamingOhlc.hourlyOhlcToFiles(spark, sf, out)
    val emitted = spark.read.parquet(path)
    val batch = TickOps.ohlcBars(
      TickOps.normalizeEvents(Tables.events(spark, sf)), "1 hour")

    // every emitted bar is bit-identical to its batch twin
    assert(emitted.count() > 0, "file sink emitted nothing")
    assert(emitted.except(batch).isEmpty,
      "file sink emitted a bar the batch plan does not produce")

    // and it covers at least every bar strictly older than the final
    // watermark (max event time - 1h delay), i.e. only trailing bars may
    // still be open in state
    val maxTs = TickOps.normalizeEvents(Tables.events(spark, sf))
      .agg(max(col("event_ts"))).first().getTimestamp(0)
    val closed = batch.filter(
      col("bar_start") + expr("INTERVAL 2 HOURS") <= lit(maxTs))
    assert(closed.except(emitted).isEmpty,
      "a watermark-closed bar is missing from the file sink")
  }
}
