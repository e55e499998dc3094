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

  test("change feed: insert/update/delete/revival with exact pre/post images") {
    val path = freshTable("cdf")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    SnapshotOps.commitUpsert(path,
      state((2L, "B", 2.5), (3L, "c", 3.0)), "k") // update 2, insert 3
    SnapshotOps.commitDelete(spark, path, Seq(1L).toDF("k"), "k")
    SnapshotOps.commitUpsert(path, state((1L, "A", 9.0)), "k") // revive 1

    val got = SnapshotOps.tableChanges(spark, path, 0L, 3L, "k")
      .as[(Long, Long, String, String, Double)].collect().sorted.toSeq
    assert(got == Seq(
      (1L, 2L, "delete", "a", 1.0),
      (1L, 3L, "insert", "A", 9.0),
      (2L, 1L, "update_postimage", "B", 2.5),
      (2L, 1L, "update_preimage", "b", 2.0),
      (3L, 1L, "insert", "c", 3.0)), got.toString)

    // a narrower range sees only its own commits
    val tail = SnapshotOps.tableChanges(spark, path, 2L, 3L, "k")
      .as[(Long, Long, String, String, Double)].collect().toSeq
    assert(tail == Seq((1L, 3L, "insert", "A", 9.0)), tail.toString)
  }

  test("change feed suppresses no-op writes and checkpoint rewrites") {
    val path = freshTable("cdfnoop")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    SnapshotOps.commitUpsert(path, state((1L, "a", 1.0)), "k") // no-op write
    SnapshotOps.checkpoint(spark, path, "k") // rewrites every key
    SnapshotOps.commitUpsert(path, state((2L, "B", 2.0)), "k")
    SnapshotOps.commitDelete(spark, path, Seq(9L).toDF("k"), "k") // absent key

    val got = SnapshotOps.tableChanges(spark, path, 0L, 4L, "k")
      .as[(Long, Long, String, String, Double)].collect().toSeq.sorted
    assert(got == Seq(
      (2L, 3L, "update_postimage", "B", 2.0),
      (2L, 3L, "update_preimage", "b", 2.0)), got.toString)
  }

  test("vacuum removes pre-checkpoint commits physically and from the log") {
    val path = freshTable("vac")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    SnapshotOps.commitUpsert(path, state((2L, "B", 2.5)), "k")
    SnapshotOps.checkpoint(spark, path, "k") // v2, base
    SnapshotOps.commitUpsert(path, state((3L, "c", 3.0)), "k")

    assert(SnapshotOps.vacuum(path) == Seq(0L, 1L))
    assert(SnapshotOps.versions(path) == Seq(2L, 3L))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/delta/v=0")), "v0 files survived")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$path/delta/v=1")), "v1 files survived")
    val gone = intercept[IllegalArgumentException] {
      SnapshotOps.readAsOf(spark, path, 1L, "k")
    }
    assert(gone.getMessage.contains("not in the log"), gone.getMessage)
    val head = SnapshotOps.readAsOf(spark, path, 3L, "k")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(head == Seq((1L, "a", 1.0), (2L, "B", 2.5), (3L, "c", 3.0)))
    // vacuum is idempotent once only bases remain ahead
    assert(SnapshotOps.vacuum(path) == Seq.empty)
  }

  test("schema evolution: per-version schema, null back-fill, old reads unchanged") {
    val path = freshTable("evo")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    SnapshotOps.commitUpsert(path,
      Seq((2L, "B", 2.5, "x")).toDF("k", "s", "p", "extra"), "k")

    val v0 = SnapshotOps.readAsOf(spark, path, 0L, "k")
    assert(!v0.columns.contains("extra"),
      s"a later commit's column leaked into the v0 read: ${v0.columns.toSeq}")
    assert(v0.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0)))

    val v1 = SnapshotOps.readAsOf(spark, path, 1L, "k")
      .as[(Long, String, Double, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(v1 == Seq((1L, "a", 1.0, None), (2L, "B", 2.5, Some("x"))))
  }

  test("forget erases keys from every remaining byte on disk") {
    val path = freshTable("forget")
    SnapshotOps.initTable(
      state((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), path, "k")
    SnapshotOps.commitUpsert(path, state((2L, "B", 2.5)), "k")
    val v = SnapshotOps.forget(spark, path, Seq(2L).toDF("k"), "k")

    // surviving state is exact
    val got = SnapshotOps.readAsOf(spark, path, v, "k")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", 1.0), (3L, "c", 3.0)))

    // byte-level absence: scan EVERY remaining file raw (no version
    // filter, tombstones included) — key 2 must appear nowhere
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/delta")
    assert(raw.filter(col("k") === 2L).count() == 0,
      "forgotten key survives in some on-disk file")
    assert(raw.filter(col("s") === "B" || col("s") === "b").count() == 0,
      "forgotten payload survives in some on-disk file")

    // pre-forget versions are GONE, not resurrectable
    assert(SnapshotOps.versions(path) == Seq(v))
    val old = intercept[IllegalArgumentException] {
      SnapshotOps.readAsOf(spark, path, 0L, "k")
    }
    assert(old.getMessage.contains("not in the log"), old.getMessage)

    // the table remains writable after a forget
    SnapshotOps.commitUpsert(path, state((4L, "d", 4.0)), "k")
    assert(SnapshotOps.readAsOf(spark, path, v + 1, "k").count() == 3)
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

  test("optimistic commit: disjoint stale writers retry and both land") {
    val path = freshTable("occ_disjoint")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    // two writers both read v0; A lands first, B's commit validates
    // against the unseen v1 (key-disjoint → blind upserts commute) and
    // retries onto v2 instead of overwriting or failing
    val vA = SnapshotOps.commitUpsertOptimistic(spark, path,
      state((1L, "A", 10.0)), "k", readVersion = 0L)
    assert(vA == 1L)
    val vB = SnapshotOps.commitUpsertOptimistic(spark, path,
      state((2L, "B", 20.0)), "k", readVersion = 0L)
    assert(vB == 2L)
    val fin = SnapshotOps.readAsOf(spark, path, 2L, "k")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(fin == Map(1L -> ("A", 10.0), 2L -> ("B", 20.0)), fin)
  }

  test("optimistic commit: overlapping stale writer is rejected loudly") {
    val path = freshTable("occ_conflict")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    val vA = SnapshotOps.commitUpsertOptimistic(spark, path,
      state((1L, "A", 10.0)), "k", readVersion = 0L)
    assert(vA == 1L)
    // writer C read v0 and writes key 1 — writer A's unseen commit
    // touched it: a true write-write conflict, surfaced by name
    val ex = intercept[SnapshotOps.ConcurrentCommitException] {
      SnapshotOps.commitUpsertOptimistic(spark, path,
        state((1L, "C", 30.0), (2L, "C", 30.0)), "k", readVersion = 0L)
    }
    assert(ex.getMessage.contains("write-write conflict"), ex.getMessage)
    // the rejected commit left nothing behind: log head is still v1
    // and the state is writer A's
    assert(SnapshotOps.versions(path) == Seq(0L, 1L))
    val fin = SnapshotOps.readAsOf(spark, path, 1L, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == Map(1L -> "A", 2L -> "b"), fin)
    // a non-committed readVersion is refused up front
    val badRv = intercept[IllegalArgumentException] {
      SnapshotOps.commitUpsertOptimistic(spark, path,
        state((2L, "D", 1.0)), "k", readVersion = 9L)
    }
    assert(badRv.getMessage.contains("not a committed version"),
      badRv.getMessage)
  }

  test("optimistic delete: disjoint commutes, overlap with an unseen write is rejected") {
    val path = freshTable("occ_delete")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0)), path, "k")
    val vA = SnapshotOps.commitUpsertOptimistic(spark, path,
      state((1L, "A", 10.0)), "k", readVersion = 0L)
    assert(vA == 1L)
    // stale deleter of key 3 — disjoint from A's write, lands at v2
    val vD = SnapshotOps.commitDeleteOptimistic(spark, path,
      Seq(3L).toDF("k"), "k", readVersion = 0L)
    assert(vD == 2L)
    val fin = SnapshotOps.readAsOf(spark, path, 2L, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == Map(1L -> "A", 2L -> "b"), fin)
    // stale deleter of key 1 — writer A rewrote it after our read:
    // deleting it blind would silently erase A's commit, so it's a
    // conflict, not a retry
    val ex = intercept[SnapshotOps.ConcurrentCommitException] {
      SnapshotOps.commitDeleteOptimistic(spark, path,
        Seq(1L).toDF("k"), "k", readVersion = 0L)
    }
    assert(ex.getMessage.contains("write-write conflict"), ex.getMessage)
    assert(SnapshotOps.versions(path) == Seq(0L, 1L, 2L))
  }

  test("optimistic commit racing a checkpoint commutes (base commits are no conflict)") {
    val path = freshTable("occ_checkpoint")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    SnapshotOps.commitUpsert(path, state((2L, "B", 20.0)), "k") // v1
    SnapshotOps.checkpoint(spark, path, "k") // v2, base: carries EVERY live key
    // writer read v0 and upserts key 1: unseen range is (0, 2] — v1 is
    // key-disjoint and v2 is a checkpoint (a full rewrite that changes
    // no data). Scanning the checkpoint's delta would see key 1 and
    // spuriously reject; base commits commute with every upsert/delete,
    // so this must land at v3.
    val v = SnapshotOps.commitUpsertOptimistic(spark, path,
      state((1L, "A", 10.0)), "k", readVersion = 0L)
    assert(v == 3L)
    val fin = SnapshotOps.readAsOf(spark, path, 3L, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == Map(1L -> "A", 2L -> "B"), fin)
    // a REAL conflict hiding behind the checkpoint is still caught:
    // v1 rewrote key 2, so a v0 reader writing key 2 must be rejected
    val ex = intercept[SnapshotOps.ConcurrentCommitException] {
      SnapshotOps.commitUpsertOptimistic(spark, path,
        state((2L, "X", 99.0)), "k", readVersion = 0L)
    }
    assert(ex.getMessage.contains("write-write conflict"), ex.getMessage)
  }

  test("optimistic schema-add commutes with data commits; incompatible schema adds reject") {
    import org.apache.spark.sql.functions.lit
    val path = freshTable("occ_schema")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0)), path, "k")
    // writer A (read v0): plain data upsert of key 2 — lands at v1
    assert(SnapshotOps.commitUpsertOptimistic(spark, path,
      state((2L, "B", 20.0)), "k", readVersion = 0L) == 1L)
    // writer S (read v0): upsert of key 1 CARRYING A NEW COLUMN — the
    // add-column commit. Key-disjoint from the unseen v1 and its
    // column set is compatible (the new name collides with nothing),
    // so schema ∥ data commutes and it lands at v2.
    val vS = SnapshotOps.commitUpsertOptimistic(spark, path,
      state((1L, "A", 10.0)).withColumn("extra", lit("x")),
      "k", readVersion = 0L)
    assert(vS == 2L)
    // the merged read sees the evolved schema: key 1 carries the new
    // column, key 2 back-fills null
    val fin = SnapshotOps.readAsOf(spark, path, 2L, "k")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getAs[String]("extra")))).toMap
    assert(fin == Map(1L -> ("A", Some("x")), 2L -> ("B", None)), fin)
    // writer T (read v0): adds the SAME column name at a DIFFERENT
    // type — unchecked this wedges every future mergeSchema read, so
    // it must reject loudly as a schema conflict (key 2 would even be
    // a key conflict; use key 3 so the schema rule is what fires)
    val ex = intercept[SnapshotOps.ConcurrentCommitException] {
      SnapshotOps.commitUpsertOptimistic(spark, path,
        state((3L, "C", 30.0)).withColumn("extra", lit(1.5)),
        "k", readVersion = 0L)
    }
    assert(ex.getMessage.contains("schema conflict"), ex.getMessage)
    assert(SnapshotOps.versions(path) == Seq(0L, 1L, 2L))
  }

  test("optimistic commit: racing threads all land on distinct versions") {
    val path = freshTable("occ_race")
    SnapshotOps.initTable(state((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0), (4L, "d", 4.0)), path, "k")
    // four genuinely concurrent key-disjoint writers from the same read
    // version: the rename arbiter serializes them; every writer must
    // land (with retries), each on its own version
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val landed = Await.result(
      Future.sequence((1 to 4).map { i =>
        Future(SnapshotOps.commitUpsertOptimistic(spark, path,
          state((i.toLong, s"T$i", i * 100.0)), "k", readVersion = 0L))
      }), 120.seconds)
    assert(landed.sorted == Seq(1L, 2L, 3L, 4L), landed)
    val fin = SnapshotOps.readAsOf(spark, path, 4L, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fin == Map(1L -> "T1", 2L -> "T2", 3L -> "T3", 4L -> "T4"), fin)
  }
}
