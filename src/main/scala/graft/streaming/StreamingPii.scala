package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming PII scan — compliance IN FLIGHT rather than as a nightly
  * sweep: the document stream passes through the same regex
  * detect/redact map the batch `pii_scan` uses, per micro-batch via
  * foreachBatch into an append sink. The scan is a per-row pure
  * function, so the result is identical under any micro-batch slicing
  * and the batch oracle applies verbatim (the `streaming_ann_append`
  * argument). No state, no watermark; per-batch cost scales with the
  * batch, and redacted digests (never raw matched spans) reach the
  * sink.
  *
  * The sink is replay-safe: each micro-batch lands in its own
  * `batch_id=N` subdirectory and a batch whose directory already
  * carries a _SUCCESS marker is skipped, so a micro-batch redelivered
  * after a mid-run failure (foreachBatch's at-least-once contract)
  * cannot append duplicate rows — without this, only a clean
  * single-shot run matches the batch oracle. */
object StreamingPii {

  /** `augment` maps a raw documents micro-batch to the (doc_id, text)
    * frame the scanner reads — the registered query passes the same
    * deterministic PII-planting projection the batch twin uses, so
    * stream and batch scan literally identical text. */
  def scanAvailableNow(spark: SparkSession, dir: String, workDir: String,
                       augment: DataFrame => DataFrame,
                       maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val out = s"$workDir/scanned"
    // Seed the sink with an empty frame carrying the output schema so a
    // zero-row stream reads back empty instead of path-not-found.
    graft.ops.TextOps.piiScan(
        augment(graft.Tables.documents(spark, dir).limit(0)))
      .write.mode("append").parquet(s"$out/batch_id=-1")
    val reader = spark.readStream
      .schema(spark.read.parquet(s"$dir/documents.parquet").schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val stream = reader.parquet(s"$dir/documents.parque*")
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val dest = s"$out/batch_id=$batchId"
        // idempotent per batch: a completed directory (has _SUCCESS) is
        // a replayed delivery — skip; a partial one (crash mid-write)
        // is cleared and rewritten
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(dest, "_SUCCESS"))) {
          graft.util.Fs.deleteRec(dest)
          graft.ops.TextOps.piiScan(augment(b))
            .write.mode("overwrite").parquet(dest)
        }
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // batch_id is sink bookkeeping (partition-discovered), not output
    spark.read.parquet(out).drop("batch_id")
  }
}
