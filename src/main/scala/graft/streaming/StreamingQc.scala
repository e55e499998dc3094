package graft.streaming

import graft.ops.TickOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming quality-check sinks (SURVEY.md §2.9: "QC checks become
  * foreachBatch sinks"): each micro-batch of the tick stream fans out to
  * the E2 report branches — invalid rows appended to a quarantine table,
  * per-symbol QC counters merged into a running summary. foreachBatch
  * gives batch-DataFrame semantics (joins, overwrite/append sinks) per
  * micro-batch, which is exactly the reference's per-day report shape
  * replayed incrementally.
  */
object StreamingQc {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Run the QC stream to completion; returns (quarantine dir, summary
    * dir) with parquet results. */
  def runAvailableNow(spark: SparkSession, dir: String, workDir: String,
                      maxFilesPerTrigger: Option[Int] = None): (String, String) = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val quarantine = s"$workDir/quarantine"
    val summary = s"$workDir/summary"
    val reader = spark.readStream.schema(eventsSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader.parquet(s"$dir/events.parque*")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val ticks = TickOps.normalizeEvents(raw)
    val qcCols = Seq("price", "qty", "trader_id")

    StreamingConf.withStatePartitions(spark) {
      val q = ticks.writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val b = batch.cache()
          TickOps.invalidRows(b, qcCols)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(quarantine)
          graft.ops.QualityOps.invalidSummary(b, qcCols, "symbol")
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(summary)
          b.unpersist()
          ()
        }
        .start()
      q.awaitTermination()
    }
    (quarantine, summary)
  }
}
