package graft.streaming

import graft.ops.TickOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact deduplication (§2.9 uplift of the dedup family):
  * `dropDuplicatesWithinWatermark` over the normalized tick stream.
  *
  * The watermark bounds the dedup state — keys older than the watermark
  * delay are evicted, so state is O(keys-per-delay-window), not O(all
  * keys ever): the only dedup shape that survives an unbounded stream.
  * Within the watermark the dedup is exact; a duplicate arriving later
  * than the delay after its first occurrence could be re-emitted (the
  * documented watermark trade).
  *
  * The key is (symbol, second-truncated ts) projected BEFORE the dedup,
  * so the state stores only the key pair, never whole rows, and the
  * emitted result is key-deterministic (keeping whole first-seen rows
  * would make non-key columns arrival-order-dependent — not
  * oracle-comparable, and a trap at scale where arrival order is the
  * shuffle's choice).
  */
object StreamingDedup {

  /** Distinct (symbol, second) pairs from the event stream; AvailableNow
    * + append memory sink as the harness adapter. On the single-file
    * fixture everything lands in one micro-batch, so the watermark never
    * evicts mid-run and the result equals the batch DISTINCT exactly. */
  def distinctTicksAvailableNow(spark: SparkSession, dir: String,
                                queryName: String = "streaming_dedup",
                                maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ticks = TickOps.normalizeEvents(
      StreamingOhlc.rawEventStream(spark, dir, maxFilesPerTrigger))
    StreamingConf.withStatePartitions(spark) {
      val q = ticks
        .select(col("symbol"), date_trunc("second", col("event_ts")).as("ts_sec"))
        .withWatermark("ts_sec", "24 hours")
        .dropDuplicatesWithinWatermark("symbol", "ts_sec")
        .writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }
}
