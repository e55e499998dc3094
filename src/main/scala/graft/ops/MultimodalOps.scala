package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic STUB (md5-derived pseudo-dimensions); the
  * Spark-side shape is real and tested: binary columns, a typed
  * `Dataset[MediaRow]`, partition-batched `mapPartitions` (the Scala-native
  * equivalent of `mapInPandas` — one iterator per partition, amortized
  * per-batch setup such as loading a codec), and schema-stable output.
  * At 100 TB this is a narrow, shuffle-free map; payload bytes stream
  * through executors without driver involvement.
  */
object MultimodalOps {

  /** A media row: opaque payload + source metadata. */
  final case class MediaRow(media_id: Long, media_type: String,
                            payload: Array[Byte])

  /** Decoded metadata (what a real image decode would yield). */
  final case class MediaMeta(media_id: Long, media_type: String,
                             n_bytes: Long, width: Long, height: Long,
                             n_frames: Long)

  /** Deterministic 60-bit hash of bytes — md5 hex prefix, identical to
    * functions.Hashing.md5Long over the same bytes. */
  private[ops] def md5Long(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Documents → media table: text payload as the opaque binary stand-in
    * (schema shape is what matters; bytes are bytes). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("video"))
        .as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode: real pipelines would call an image codec here. The fake
    * is deterministic from the payload bytes so the DuckDB oracle can
    * reproduce it. Runs as partition-batched iterator transform —
    * per-partition setup happens once (where a codec would be loaded). */
  def decodeMedia(media: DataFrame): Dataset[MediaMeta] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup would go here (codec init, model load, ...)
      rows.map { m =>
        val h = md5Long(m.payload) % graft.functions.Hashing.Mersenne31
        val nb = m.payload.length.toLong
        MediaMeta(
          media_id = m.media_id,
          media_type = m.media_type,
          n_bytes = nb,
          width = h % 640 + 1,
          height = (h / 640) % 480 + 1,
          n_frames = if (m.media_type == "video") nb / 10 else 1L)
      }
    }
  }

  /** Frame sampling stub: the payload split into fixed-stride chunks,
    * each "frame" summarized by its digest — exercises binary slicing and
    * per-frame row output from binary input (full chunks only). Emits one
    * scalar row per frame `(media_id, n_bytes, frame_idx, digest)` rather
    * than an array column, so downstream sinks/compares see flat columns;
    * media shorter than one stride yields no rows (explode of empty). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .select(
        col("media_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        posexplode(expr(
          s"transform(sequence(1, int(length(payload) / $stride)), " +
            s"i -> md5(substring(payload, (i - 1) * $stride + 1, $stride)))"))
          .as(Seq("pos", "digest")))
      .select(
        col("media_id"), col("n_bytes"),
        (col("pos") + 1).cast("int").as("frame_idx"),
        col("digest"))
}
