package graft

import graft.ops.SnapshotOps
import graft.util.Fs
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot time travel: the commit log round-trips state at every
  * version, AS-OF reads partition-prune later commits out of the scan,
  * checkpoint replay equals full-log replay, and the commit-time
  * contracts (one row per key, init-once, known versions) fail loudly.
  */
class SnapshotSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshTable(tag: String): String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_snap_$tag"
    Fs.deleteRec(p)
    p
  }

  private def state(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("k", "s", "p")

  test("readAsOf reconstructs every version of an upsert/delete history") {
    val path = freshTable("hist")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    SnapshotOps.commitUpsert(path,
      state((2L, "B", 2.5), (3L, "c", 3.0)), "k") // update 2, insert 3
    SnapshotOps.commitDelete(spark, path, Seq(1L).toDF("k"), "k")
    SnapshotOps.commitUpsert(path, state((1L, "A", 9.0)), "k") // revive 1

    def asOf(v: Long) = SnapshotOps.readAsOf(spark, path, v, "k")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(asOf(0) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(asOf(1) == Seq((1L, "a", 1.0), (2L, "B", 2.5), (3L, "c", 3.0)))
    assert(asOf(2) == Seq((2L, "B", 2.5), (3L, "c", 3.0)))
    assert(asOf(3) == Seq((1L, "A", 9.0), (2L, "B", 2.5), (3L, "c", 3.0)))
    assert(SnapshotOps.versions(path) == Seq(0L, 1L, 2L, 3L))
  }

  test("as-of reads prune later commits' files out of the scan") {
    val path = freshTable("prune")
    SnapshotOps.initTable(state((1L, "a", 1.0)), path, "k")
    (1 to 4).foreach(i =>
      SnapshotOps.commitUpsert(path, state((i.toLong, "u", i * 1.0)), "k"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SnapshotOps.readAsOf(spark, path, 1L, "k")
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no file scan in the as-of plan")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "v")),
          s"version predicate did not reach partition filters: " +
            s"${s.partitionFilters}")
        val totalFiles = spark.read.parquet(s"$path/delta").inputFiles.length
        assert(s.metrics("numFiles").value < totalFiles,
          s"as-of v1 read ${s.metrics("numFiles").value} of $totalFiles " +
            "files — later commits were not pruned")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("checkpoint replay equals full-log replay and rebases the read") {
    val path = freshTable("ckpt")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    SnapshotOps.commitUpsert(path, state((2L, "B", 2.5)), "k")
    SnapshotOps.commitDelete(spark, path, Seq(1L).toDF("k"), "k")
    val ck = SnapshotOps.checkpoint(spark, path, "k") // v3, base
    SnapshotOps.commitUpsert(path, state((4L, "d", 4.0)), "k")

    // post-checkpoint read must not scan pre-checkpoint deltas
    val df = SnapshotOps.readAsOf(spark, path, 4L, "k")
    val got = df.as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, "B", 2.5), (4L, "d", 4.0)))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scans = {
        val d2 = SnapshotOps.readAsOf(spark, path, 4L, "k")
        d2.collect()
        d2.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }
      }
      scans.foreach { s =>
        val total = spark.read.parquet(s"$path/delta").inputFiles.length
        assert(s.metrics("numFiles").value < total,
          "read past a checkpoint must skip pre-checkpoint delta files")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(ck == 3L)
  }

  test("commit contracts fail loudly") {
    val path = freshTable("contracts")
    SnapshotOps.initTable(state((1L, "a", 1.0)), path, "k")
    val dup = intercept[IllegalArgumentException] {
      SnapshotOps.commitUpsert(path,
        state((2L, "x", 1.0), (2L, "y", 2.0)), "k")
    }
    assert(dup.getMessage.contains("duplicate keys"), dup.getMessage)
    val reinit = intercept[IllegalArgumentException] {
      SnapshotOps.initTable(state((1L, "a", 1.0)), path, "k")
    }
    assert(reinit.getMessage.contains("already has a log"), reinit.getMessage)
    val badV = intercept[IllegalArgumentException] {
      SnapshotOps.readAsOf(spark, path, 7L, "k")
    }
    assert(badV.getMessage.contains("not in the log"), badV.getMessage)
  }
}
