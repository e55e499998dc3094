package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Snapshot table with time travel — the Delta/Iceberg-lite capability
  * next to compaction/z-order (reference has a plain overwrite warehouse,
  * `data_platform_final.py:208-231`; versioned reads are the extension a
  * warehouse user expects): every commit appends a DELTA (upserted rows +
  * key tombstones) plus a tiny JSON manifest, and `readAsOf(v)`
  * reconstructs the table at any committed version.
  *
  * Layout under the table root:
  *   delta/v=N/part-*.parquet— commit N's rows: payload + `__deleted` flag
  *   _graft_log/N.json     — manifest {version, op, base} (base = this
  *                           commit is a full snapshot, not a delta)
  *
  * Read path (merge-on-read, the scale design):
  *  - version selection is a PARTITION-PRUNED scan: deltas live under a
  *    `v=N` partition directory, so `v BETWEEN base AND asOf` never
  *    opens later commits' files (SnapshotSpec asserts the pruning);
  *  - reconstruction is latest-row-per-key = ONE hash aggregate
  *    `max(struct(v, __deleted, payload))` keyed on the table key — one
  *    shuffle regardless of how many commits the range spans, never an
  *    iterative join chain over the log;
  *  - determinism: a commit holds at most one row per key (enforced),
  *    so the struct max is decided by the distinct `v` field alone.
  *
  * Log growth is bounded by CHECKPOINTS: `checkpoint()` materializes the
  * current state as a full-snapshot commit (manifest `base=true`), and
  * readAsOf replays from the newest base ≤ asOf — O(deltas since last
  * checkpoint), not O(history). The checkpoint itself is the same
  * one-shuffle read plus a partitioned write, safe to run on a schedule
  * exactly like compaction.
  */
object SnapshotOps {

  /** The tombstone/liveness flag carried by every delta row. */
  val DeletedCol = "__deleted"

  private def logDir(path: String) = Paths.get(path, "_graft_log")

  private def manifest(path: String, v: Long): java.nio.file.Path =
    logDir(path).resolve(s"$v.json")

  private def writeManifest(path: String, v: Long, op: String,
                            base: Boolean): Unit = {
    Files.createDirectories(logDir(path))
    Files.write(manifest(path, v),
      s"""{"version": $v, "op": "$op", "base": $base}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  private def readManifest(path: String, v: Long): (String, Boolean) = {
    val s = new String(Files.readAllBytes(manifest(path, v)),
      StandardCharsets.UTF_8)
    val op = "\"op\": \"([^\"]*)\"".r.findFirstMatchIn(s).map(_.group(1))
      .getOrElse("?")
    (op, s.contains("\"base\": true"))
  }

  /** Committed versions in ascending order (the manifest listing IS the
    * log — a partial data write without its manifest is invisible, so
    * the manifest write is the commit's atomicity point). */
  def versions(path: String): Seq[Long] =
    if (!Files.isDirectory(logDir(path))) Seq.empty
    else Files.list(logDir(path)).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.endsWith(".json") => n.dropRight(5).toLong }
      .toSeq.sorted

  /** Create the table at version 0 (a full-snapshot base commit). */
  def initTable(df: DataFrame, path: String, key: String): Long = {
    require(versions(path).isEmpty,
      s"snapshot table at $path already has a log; commit instead")
    writeDelta(df.withColumn(DeletedCol, lit(false)), path, key, 0L)
    writeManifest(path, 0L, "init", base = true)
    0L
  }

  /** Append an upsert commit: `updates` rows win over any earlier
    * version of their key. Returns the new version. */
  def commitUpsert(path: String, updates: DataFrame, key: String): Long =
    commit(path, updates.withColumn(DeletedCol, lit(false)), key, "upsert")

  /** Append a delete commit: every key in `keys` is tombstoned (payload
    * columns null in the delta — the version field decides the read). */
  def commitDelete(spark: SparkSession, path: String, keys: DataFrame,
                   key: String): Long = {
    // typed nulls: a bare lit(null) is NullType, which parquet rejects
    val payload = tableSchema(spark, path).filter(f =>
      f.name != key && f.name != DeletedCol && f.name != "v")
    val nulls = payload.map(f => lit(null).cast(f.dataType).as(f.name))
    commit(path,
      keys.select((col(key) +: nulls :+ lit(true).as(DeletedCol)): _*),
      key, "delete")
  }

  /** Materialize the current state as a full-snapshot commit; readAsOf
    * for any later version replays from here, bounding log-replay cost. */
  def checkpoint(spark: SparkSession, path: String, key: String): Long = {
    val state = readAsOf(spark, path, versions(path).max, key)
    commit(path, state.withColumn(DeletedCol, lit(false)), key,
      "checkpoint", base = true)
  }

  private def commit(path: String, delta: DataFrame, key: String,
                     op: String, base: Boolean = false): Long = {
    val vs = versions(path)
    require(vs.nonEmpty, s"snapshot table at $path has no log; initTable first")
    val v = vs.max + 1
    writeDelta(delta, path, key, v)
    writeManifest(path, v, op, base)
    v
  }

  private def writeDelta(delta: DataFrame, path: String, key: String,
                         v: Long): Unit = {
    // one row per key per commit — what makes max(struct(v, …)) a
    // deterministic reconstruction (v is then unique within every key)
    val dup = delta.groupBy(col(key)).count().filter(col("count") > 1)
    require(dup.isEmpty,
      s"commit carries duplicate keys (e.g. ${dup.select(col(key))
        .head(3).mkString(", ")}); dedupe before committing")
    delta.write.mode(SaveMode.ErrorIfExists).parquet(s"$path/delta/v=$v")
  }

  private def tableColumns(spark: SparkSession, path: String): Seq[String] =
    spark.read.parquet(s"$path/delta").columns.filter(_ != "v").toSeq

  private def tableSchema(spark: SparkSession,
                          path: String): Seq[org.apache.spark.sql.types.StructField] =
    spark.read.parquet(s"$path/delta").schema.fields.toSeq

  /** The table as of version `asOf`: newest-base-≤-asOf + later deltas,
    * collapsed to the latest row per key, tombstones dropped. */
  def readAsOf(spark: SparkSession, path: String, asOf: Long,
               key: String): DataFrame = {
    val vs = versions(path)
    require(vs.contains(asOf),
      s"version $asOf not in the log (have ${vs.mkString(",")})")
    val base = vs.filter(v => v <= asOf && readManifest(path, v)._2).max
    val payload = tableColumns(spark, path).filter(c =>
      c != key && c != DeletedCol)
    val latest = spark.read.parquet(s"$path/delta")
      // v=N is a partition column: this range predicate PRUNES later
      // (and pre-base) commit directories out of the scan entirely
      .filter(col("v") >= base && col("v") <= asOf)
      .groupBy(col(key))
      .agg(max(struct((col("v") +: col(DeletedCol) +:
        payload.map(col)): _*)).as("__r"))
    latest
      .filter(!col("__r").getField(DeletedCol))
      .select(col(key) +: payload.map(c => col("__r").getField(c).as(c)): _*)
  }
}
