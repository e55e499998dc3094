package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The change-data feed consumed as a STREAMING SOURCE — the streaming
  * twin of `cdf_incremental_agg` (the round-11 verdict's "CDF as a
  * streaming source"): a snapshot table's per-version change batches
  * (graft.ops.SnapshotOps.tableChanges) are spooled to files exactly as
  * a log tailer would deliver them, streamed back in micro-batches, and
  * a per-group (count, decimal-exact total) aggregate is MAINTAINED
  * from the signed deltas alone — the base table is never rescanned
  * after version 0.
  *
  * Replay safety is the engine-wide foreachBatch discipline
  * ([[StreamingDocApply]]): each micro-batch writes its PARTIAL signed
  * delta to a `batch_id=N`-keyed directory, a redelivered batch
  * (_SUCCESS already present) is skipped, a partial directory is
  * cleared and rewritten. Slicing invariance is STRUCTURAL, not
  * incidental: the maintained state is base + Σ(partials), and signed
  * deltas are additive — any micro-batch slicing of the same feed sums
  * to the same state (StreamingCdfSpec pins 1-file and all-at-once
  * slicings to the same rows). At 100 TB each partial is one
  * status-keyed hash-agg over one micro-batch; the merge is a sum over
  * |groups|·|batches| tiny rows. */
object StreamingCdf {

  /** Stream the change feed of the snapshot table at `path` and return
    * the maintained per-`groupCol` aggregate of `valueCol` (count +
    * 2-dp total — `cdf_incremental_agg`'s exact output contract). */
  def consumeAvailableNow(spark: SparkSession, path: String,
                          workDir: String, key: String,
                          groupCol: String = "o_orderstatus",
                          valueCol: String = "o_totalprice",
                          maxFilesPerTrigger: Option[Int] = Some(1)): DataFrame = {
    import graft.ops.SnapshotOps
    val vs = SnapshotOps.versions(path)
    graft.util.Fs.deleteRec(workDir)
    val spool = s"$workDir/cdf_spool"
    // spool one file per version: the file-ized feed a commit-log
    // tailer delivers (a base/checkpoint version emits no changes).
    // The WHOLE feed is one window pass — tableChanges(min, max) lags
    // per key across every version, so its per-v slices ARE the
    // per-commit feeds (pre/post images telescope exactly). ONE
    // partitioned write spools every version in a single job:
    // repartition(v) lands each commit's rows in one task, so each
    // v=N directory holds exactly one file and maxFilesPerTrigger=1
    // still slices at commit granularity — where the per-version
    // filter + coalesce(1) loop paid one write job (and one pass over
    // the cached feed) PER COMMIT (guide §2.4/§6: one exchange keyed
    // by the layout you need, files sized by the writer's partition).
    val feed = SnapshotOps
      .tableChanges(spark, path, vs.min, vs.max, key)
    if (vs.size == 1)
      // base-only log: nothing to spool, so the directory would not
      // exist and the reads below would throw PATH_NOT_FOUND instead
      // of returning the base aggregate — seed one empty file with the
      // feed schema so the stream starts (and contributes zero deltas).
      feed.limit(0).coalesce(1).write.mode("append").parquet(spool)
    else
      feed.filter(col("v") > vs.min)
        .repartition(col("v"))
        .write.partitionBy("v").mode("append").parquet(spool)
    def dec(c: Column) = c.cast("decimal(30,6)")
    def partial(b: DataFrame): DataFrame =
      b.select(col(groupCol),
          when(col("change_type").isin("insert", "update_postimage"),
            lit(1L)).otherwise(lit(-1L)).as("sgn"),
          col(valueCol))
        .groupBy(col(groupCol))
        .agg(sum(col("sgn")).as("dn"),
          sum(when(col("sgn") === 1L, dec(col(valueCol)))
            .otherwise(-dec(col(valueCol)))).as("dt"))
    val out = s"$workDir/partials"
    // schema seed: a zero-row stream reads back empty, not path-not-found
    partial(spark.read.parquet(spool).limit(0))
      .write.mode("append").parquet(s"$out/batch_id=-1")
    val reader = spark.readStream.schema(spark.read.parquet(spool).schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    // state-sized shuffle partitions: each micro-batch is one commit's
    // file — the per-group partial agg should run at state width, not
    // the batch engine's scan width (foreachBatch trigger cost scales
    // with tasks-per-trigger; round-12 controlled experiment).
    StreamingConf.withStatePartitions(spark) {
      val q = reader.parquet(spool)
        .writeStream
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          val dest = s"$out/batch_id=$batchId"
          if (!java.nio.file.Files.exists(
              java.nio.file.Paths.get(dest, "_SUCCESS"))) {
            graft.util.Fs.deleteRec(dest)
            partial(b).write.mode("overwrite").parquet(dest)
          }
        }
        .option("checkpointLocation", s"$workDir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val deltas = spark.read.parquet(out).drop("batch_id")
      .groupBy(col(groupCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dt")).as("dt"))
    val base = SnapshotOps.readAsOf(spark, path, vs.min, key)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n0"), sum(dec(col(valueCol))).as("t0"))
    base.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_orders"),
        round((coalesce(col("t0"), lit(0).cast("decimal(30,6)")) +
          coalesce(col("dt"), lit(0).cast("decimal(38,6)")))
          .cast("double"), 2).as("total"))
      .filter(col("n_orders") > 0)
  }
}
