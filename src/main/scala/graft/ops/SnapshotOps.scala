package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
    // CREATE_NEW: the manifest is the commit's atomicity point, so it
    // must also be its exclusivity point — two writers racing to the
    // same version cannot both create it
    Files.write(manifest(path, v),
      s"""{"version": $v, "op": "$op", "base": $base}"""
        .getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW,
      java.nio.file.StandardOpenOption.WRITE)
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

  /** A concurrent writer committed keys this writer also writes (true
    * write-write conflict), or the log is wedged by a crashed writer's
    * orphaned delta directory — the failure optimistic concurrency is
    * REQUIRED to surface instead of silently last-writer-wins. */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** Optimistic-concurrency upsert — the other half of the Delta-style
    * story next to time travel/CDF/vacuum/forget: the writer declares
    * the version it READ (`readVersion`), and the commit validates
    * against the live log head at write time.
    *
    * Protocol (per attempt):
    *  1. every commit in (readVersion, head] — the commits this writer
    *     did NOT see — must be KEY-DISJOINT from its update set; an
    *     overlap is a true write-write conflict and throws
    *     [[ConcurrentCommitException]] (blind upserts commute only on
    *     disjoint keys);
    *  2. the delta is staged to a unique invisible directory, then
    *     ATOMIC_MOVE-renamed to `delta/v=head+1` — the rename is the
    *     race arbiter (exactly one writer per version wins);
    *  3. the winner writes the CREATE_NEW manifest (the commit point);
    *     a loser waits for the winner's manifest to appear, then
    *     re-validates against the advanced head and retries at the next
    *     version. A rename target with NO manifest after the wait is a
    *     crashed writer's orphan — fail loudly naming the directory
    *     rather than silently deleting a possibly-in-flight commit.
    *
    * At 100 TB the same protocol holds with the rename/CREATE_NEW pair
    * replaced by the object store's conditional-put primitive; the
    * validation scan is partition-pruned to the unseen versions only.
    * Returns the committed version. */
  def commitUpsertOptimistic(spark: SparkSession, path: String,
                             updates: DataFrame, key: String,
                             readVersion: Long,
                             maxRetries: Int = 10): Long =
    commitOptimistic(spark, path,
      updates.withColumn(DeletedCol, lit(false)), key, readVersion,
      "upsert", maxRetries)

  /** [[commitDelete]] under the same optimistic protocol: blind deletes
    * commute with unseen commits exactly when key-disjoint (deleting a
    * key another writer just rewrote is a true write-write conflict —
    * last-writer-wins would silently erase their commit), so the
    * validation, rename arbiter, and retry loop apply verbatim. */
  def commitDeleteOptimistic(spark: SparkSession, path: String,
                             keys: DataFrame, key: String,
                             readVersion: Long,
                             maxRetries: Int = 10): Long = {
    val payload = tableSchema(spark, path).filter(f =>
      f.name != key && f.name != DeletedCol && f.name != "v")
    val nulls = payload.map(f => lit(null).cast(f.dataType).as(f.name))
    commitOptimistic(spark, path,
      keys.select((col(key) +: nulls :+ lit(true).as(DeletedCol)): _*),
      key, readVersion, "delete", maxRetries)
  }

  private def commitOptimistic(spark: SparkSession, path: String,
                               delta: DataFrame, key: String,
                               readVersion: Long, op: String,
                               maxRetries: Int): Long = {
    val vs0 = versions(path)
    require(vs0.nonEmpty,
      s"snapshot table at $path has no log; initTable first")
    require(vs0.contains(readVersion),
      s"readVersion $readVersion is not a committed version " +
        s"(have ${vs0.mkString(",")})")
    // dup-key check mirrors writeDelta's invariant — once, up front
    require(delta.groupBy(col(key)).count().filter(col("count") > 1).isEmpty,
      "commit carries duplicate keys; dedupe before committing")
    val updKeys = delta.select(col(key)).distinct().cache()
    try {
      var validated = readVersion
      var attempt = 0
      while (attempt <= maxRetries) {
        val head = versions(path).max
        // (1) unseen commits must be key-disjoint — one pruned scan.
        // Base commits (init/checkpoint) are EXCLUDED: a checkpoint's
        // delta carries every live key (it is a full rewrite that
        // changes no data), so scanning it would spuriously reject any
        // writer racing a checkpoint() even though checkpoints commute
        // with every upsert/delete — mirror versionScan/tableChanges
        // and validate against data commits only.
        if (head > validated) {
          val unseen = ((validated + 1) to head)
            .filter(v => !readManifest(path, v)._2)
          if (unseen.nonEmpty) {
            val seenKeys = spark.read
              .option("basePath", s"$path/delta")
              .parquet(unseen.map(v => s"$path/delta/v=$v"): _*)
              .select(col(key))
            val clash = updKeys.join(seenKeys, Seq(key)).limit(1)
              .collect().headOption
            clash.foreach { r =>
              throw new ConcurrentCommitException(
                s"write-write conflict at $path: key ${r.get(0)} was " +
                  s"committed in (${validated}, $head] after this writer " +
                  s"read version $readVersion")
            }
            // SCHEMA conflict rule (schema changes ride deltas here —
            // an upsert carrying a new column IS the add-column
            // commit, resolved by the merge-on-read union): a column
            // this delta carries that an unseen commit committed with
            // a DIFFERENT type is incompatible — left alone it would
            // wedge every future mergeSchema read, so it must reject
            // at commit time, loudly. Same name + same type commutes
            // (two writers adding the same column agree), disjoint
            // new columns commute, and a pure data commit next to a
            // schema-add commutes by the same rule — the footer
            // comparison is one metadata read per unseen commit.
            val mine = delta.schema.map(f => f.name -> f.dataType).toMap
            unseen.foreach { v =>
              spark.read.parquet(s"$path/delta/v=$v").schema.foreach { f =>
                mine.get(f.name).filter(_ != f.dataType).foreach { dt =>
                  throw new ConcurrentCommitException(
                    s"schema conflict at $path: column ${f.name} was " +
                      s"committed as ${f.dataType} in v=$v but this " +
                      s"writer carries $dt — incompatible concurrent " +
                      "schema changes")
                }
              }
            }
          }
          validated = head
        }
        // (2) stage + atomic rename: the race arbiter for v = head+1
        val v = head + 1
        val stage = Paths.get(path, "delta",
          s".stage-v=$v-${java.util.UUID.randomUUID()}")
        delta.write.mode(SaveMode.ErrorIfExists).parquet(stage.toString)
        val target = Paths.get(path, "delta", s"v=$v")
        val won =
          try {
            Files.move(stage, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.AccessDeniedException |
                 _: java.nio.file.FileSystemException =>
              graft.util.Fs.deleteRec(stage.toString); false
          }
        if (won) {
          // (3) commit point — CREATE_NEW must succeed after a won
          // rename (no other writer can hold this version)
          writeManifest(path, v, op, base = false)
          return v
        }
        // lost the race: wait for the winner's manifest, then retry
        val deadline = System.nanoTime() + 5000000000L
        while (!Files.exists(manifest(path, v)) &&
               System.nanoTime() < deadline) Thread.sleep(20)
        if (!Files.exists(manifest(path, v)))
          throw new ConcurrentCommitException(
            s"log at $path is wedged: delta/v=$v exists with no " +
              "manifest (crashed writer's orphan) — remove the " +
              "directory to unwedge")
        attempt += 1
      }
      throw new ConcurrentCommitException(
        s"gave up after $maxRetries lost races at $path")
    } finally updKeys.unpersist()
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

  /** Pruned, schema-accurate scan of the commit range [`base`, `asOf`]:
    * only the listed version directories are opened (so the unified
    * `mergeSchema` schema is the schema AS OF `asOf` — a column added by
    * a later commit does not leak into earlier reads), rows from
    * pre-evolution commits carry null for later columns, and the
    * redundant `v`-range predicate keeps the partition-filter shape
    * (pruning is doubly enforced: by path list and by partition
    * pruning). Returns (scan, base). */
  private def versionScan(spark: SparkSession, path: String,
                          asOf: Long): (DataFrame, Long) = {
    val vs = versions(path)
    require(vs.contains(asOf),
      s"version $asOf not in the log (have ${vs.mkString(",")})")
    val base = vs.filter(v => v <= asOf && readManifest(path, v)._2).max
    val dirs = vs.filter(v => v >= base && v <= asOf)
      .map(v => s"$path/delta/v=$v")
    val scan = spark.read
      .option("mergeSchema", "true")
      .option("basePath", s"$path/delta")
      .parquet(dirs: _*)
      .filter(col("v") >= base && col("v") <= asOf)
    (scan, base)
  }

  private def tableSchema(spark: SparkSession,
                          path: String): Seq[org.apache.spark.sql.types.StructField] =
    versionScan(spark, path, versions(path).max)._1
      .schema.fields.toSeq

  /** The table as of version `asOf`: newest-base-≤-asOf + later deltas,
    * collapsed to the latest row per key, tombstones dropped. The
    * schema is the schema AS OF that version (see [[versionScan]]) —
    * columns added by later commits are absent, columns added by
    * earlier ones read null from pre-evolution rows. */
  def readAsOf(spark: SparkSession, path: String, asOf: Long,
               key: String): DataFrame = {
    val (scan, _) = versionScan(spark, path, asOf)
    val payload = scan.columns.filter(c =>
      c != key && c != DeletedCol && c != "v").toSeq
    val latest = scan
      .groupBy(col(key))
      .agg(max(struct((col("v") +: col(DeletedCol) +:
        payload.map(col)): _*)).as("__r"))
    latest
      .filter(!col("__r").getField(DeletedCol))
      .select(col(key) +: payload.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Row-level CHANGE DATA FEED for the commit range (`fromV`, `toV`]:
    * every effective change with its commit version and type —
    * `insert` (post-image), `delete` (pre-image), and
    * `update_preimage`/`update_postimage` pairs. The Delta
    * "table_changes" read path, computed in ONE pass:
    *
    *  - scan = newest base ≤ fromV plus the NON-base commits in range
    *    (checkpoints rewrite unchanged state — never a logical change —
    *    so they are skipped by path, which also keeps a mid-range
    *    checkpoint from flooding the feed with no-op rows);
    *  - per key, `lag` over commit order supplies each write's
    *    pre-image — ONE window shuffle for the whole range, never a
    *    per-version-pair join chain (`table_asof_diff` pays one
    *    full-outer join per step; this is the scale path when the range
    *    spans many commits);
    *  - no-op writes (payload null-safe-equal to the pre-image, or a
    *    tombstone on an absent key) are suppressed: the feed reports
    *    effective state changes, the `table_diff` semantics.
    */
  def tableChanges(spark: SparkSession, path: String, fromV: Long,
                   toV: Long, key: String): DataFrame = {
    val vs = versions(path)
    require(vs.contains(fromV) && vs.contains(toV) && fromV <= toV,
      s"bad change range ($fromV, $toV] for log ${vs.mkString(",")}")
    val base = vs.filter(v => v <= fromV && readManifest(path, v)._2).max
    val scanVs = vs.filter(v => v == base ||
      (v > base && v <= toV && !readManifest(path, v)._2))
    val scan = spark.read
      .option("mergeSchema", "true")
      .option("basePath", s"$path/delta")
      .parquet(scanVs.map(v => s"$path/delta/v=$v"): _*)
    val payload = scan.columns.filter(c =>
      c != key && c != DeletedCol && c != "v").toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("v"))
    val cur = struct(col(DeletedCol) +: payload.map(col): _*)
    val prev = lag(cur, 1).over(w)
    val prevLive = col("__prev").isNotNull &&
      !col("__prev").getField(DeletedCol)
    val curLive = !col(DeletedCol)
    val changed = payload
      .map(c => !(col(c) <=> col("__prev").getField(c)))
      .reduce(_ || _)
    def row(tpe: String, from: String => Column) =
      struct(lit(tpe).as("change_type") +:
        payload.map(c => from(c).as(c)): _*)
    val emit = when(curLive && !prevLive,
        array(row("insert", col)))
      .when(!curLive && prevLive,
        array(row("delete", c => col("__prev").getField(c))))
      .when(curLive && prevLive && changed,
        array(row("update_preimage", c => col("__prev").getField(c)),
          row("update_postimage", col)))
    // no-op writes fall through every branch to NULL, and explode(NULL)
    // emits no row — the suppression needs no empty-array sentinel
    scan
      .withColumn("__prev", prev)
      .filter(col("v") > fromV)
      .select(col(key), col("v").cast("long").as("v"),
        explode(emit).as("__c"))
      .select(Seq(col(key), col("v"),
        col("__c").getField("change_type").as("change_type")) ++
          payload.map(c => col("__c").getField(c).as(c)): _*)
  }

  /** Right-to-be-forgotten (GDPR erasure) through the commit log:
    * tombstone `keys`, checkpoint, vacuum — after this NO file under
    * the table root carries the forgotten rows (the checkpoint is
    * computed from a read that already drops tombstoned keys, and
    * vacuum physically removes every earlier delta — including the
    * tombstone commit itself and all pre-forget files holding the
    * keys' payloads). The snapshot-log answer to erasure: ONE
    * O(state) rewrite per forget batch, never a rewrite per deleted
    * row. Version history before the checkpoint is sacrificed —
    * erasure and time travel are in direct tension, and this operator
    * takes erasure (SnapshotSpec proves byte-level absence and that
    * pre-forget versions fail loudly rather than resurrect). Returns
    * the checkpoint version. */
  def forget(spark: SparkSession, path: String, keys: DataFrame,
             key: String): Long = {
    commitDelete(spark, path, keys, key)
    val v = checkpoint(spark, path, key)
    vacuum(path)
    v
  }

  /** Physically remove every commit no `readAsOf(v ≥ newest base)` can
    * reach: delta directories and manifests strictly before the newest
    * base commit. Earlier versions become unreadable (readAsOf fails
    * loudly on them — they leave the log); returns the removed
    * versions. The retention story next to [[checkpoint]]: checkpoint
    * bounds replay cost, vacuum reclaims the storage the checkpoint
    * made redundant. */
  def vacuum(path: String): Seq[Long] = {
    val vs = versions(path)
    val bases = vs.filter(v => readManifest(path, v)._2)
    require(bases.nonEmpty, s"snapshot table at $path has no base commit")
    val keep = bases.max
    val drop = vs.filter(_ < keep)
    drop.foreach { v =>
      // manifest FIRST: the manifest is the commit's atomicity point, so
      // a crash mid-vacuum must leave the version invisible to the log
      // (versions() skips it) rather than half-readable — a listed
      // version whose data directory is gone would pass readAsOf's
      // require and die inside the parquet scan instead.
      Files.deleteIfExists(manifest(path, v))
      graft.util.Fs.deleteRec(s"$path/delta/v=$v")
    }
    drop
  }
}
