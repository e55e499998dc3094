package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming PII scan — compliance IN FLIGHT rather than as a nightly
  * sweep: the document stream passes through the same regex
  * detect/redact map the batch `pii_scan` uses, per micro-batch via
  * [[StreamingDocApply]]'s replay-safe batch_id-keyed sink. Per-row
  * pure, so the batch oracle applies verbatim; only redacted digests
  * (never raw matched spans) reach the sink. */
object StreamingPii {

  /** `augment` maps a raw documents micro-batch to the (doc_id, text)
    * frame the scanner reads — the registered query passes the same
    * deterministic PII-planting projection the batch twin uses, so
    * stream and batch scan literally identical text. */
  def scanAvailableNow(spark: SparkSession, dir: String, workDir: String,
                       augment: DataFrame => DataFrame,
                       maxFilesPerTrigger: Option[Int] = None): DataFrame =
    StreamingDocApply.applyAvailableNow(spark, dir, workDir,
      b => graft.ops.TextOps.piiScan(augment(b)), maxFilesPerTrigger)
}
