package graft

import graft.queries.Staged
import graft.streaming.StreamingCdf
import graft.util.Fs
import org.scalatest.funsuite.AnyFunSuite

/** The streaming CDF consumer's slicing-invariance law: the maintained
  * aggregate is base + Σ(partial signed deltas), and signed deltas are
  * additive — so ANY micro-batch slicing of the same change feed must
  * land on the identical final rows (the structural property that lets
  * the batch oracle apply verbatim to `streaming_cdf_consume`).
  */
class StreamingCdfSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def run(tag: String, mfpt: Option[Int]): Map[String, (Long, Double)] = {
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_cdfspec_$tag"
    Fs.deleteRec(work)
    val out = StreamingCdf.consumeAvailableNow(spark,
        Staged.snapshotTable(spark, dir), work, "o_orderkey",
        maxFilesPerTrigger = mfpt)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    Fs.deleteRec(work)
    out
  }

  test("one-file-per-batch and all-at-once slicings agree exactly") {
    val sliced = run("sliced", Some(1))
    val whole = run("whole", None)
    assert(sliced.nonEmpty)
    assert(sliced == whole,
      s"slicing changed the maintained aggregate:\n$sliced\nvs\n$whole")
  }

  test("a base-only log returns the base aggregate instead of crashing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/graft_cdfspec_baseonly_tbl"
    val work = s"$tmp/graft_cdfspec_baseonly_work"
    Fs.deleteRec(path); Fs.deleteRec(work)
    graft.ops.SnapshotOps.initTable(
      Seq((1L, "O", 10.0), (2L, "F", 20.0), (3L, "O", 5.5))
        .toDF("o_orderkey", "o_orderstatus", "o_totalprice"),
      path, "o_orderkey")
    // no commits after the base: the spool has zero change files — the
    // consumer must still start (seeded empty file) and hand back the
    // version-0 aggregate, not PATH_NOT_FOUND.
    val out = StreamingCdf.consumeAvailableNow(spark, path, work,
        "o_orderkey", maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map("O" -> (2L, 15.5), "F" -> (1L, 20.0)), out)
    Fs.deleteRec(path); Fs.deleteRec(work)
  }

  test("the maintained aggregate equals the direct head-state aggregate") {
    import org.apache.spark.sql.functions._
    val path = Staged.snapshotTable(spark, dir)
    val head = graft.ops.SnapshotOps.versions(path).max
    val direct = graft.ops.SnapshotOps.readAsOf(spark, path, head, "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(30,6)")).cast("double"),
          2).as("t"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(run("direct", Some(1)) == direct)
  }
}
