package graft

import graft.ops.SimilarityOps
import graft.queries.Staged
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cell-partitioned ANN layout actually prunes at the SCAN:
  * the probe's `cell IN (...)` must surface as a partition filter on
  * the layout read (not a post-scan predicate), the scan must touch
  * fewer files than the layout holds, and the pruned query must return
  * bit-identical results to the in-memory IVF query it re-expresses. */
class LayoutPruneSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("pruned IVF top-k equals the in-memory IVF query exactly") {
    val pruned = SparkEntry.queries("ann_topk_pruned")(spark, sf)
    val mem = SparkEntry.queries("ann_topk_ivf")(spark, sf)
    assert(pruned.count() > 0)
    assert(pruned.except(mem).isEmpty && mem.except(pruned).isEmpty,
      "layout-pruned results must hash-match the in-memory IVF path")
  }

  test("the probe filter is a partition filter and the scan skips cells") {
    val layout = Staged.ivfLayout(spark, sf, 16)
    // AQE wraps scans in query stages the tree collect can't reach;
    // plan shape, not runtime re-planning, is under test here
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a narrow probe (2 queries × 2 cells) so pruning is visible even
      // at fixture scale: ≤ 4 of the 16 cell directories qualify
      val df = SimilarityOps.ivfTopKPruned(spark, layout,
        Staged.ivfCentroids(spark, sf, 16), Staged.normCorpus(spark, sf),
        Seq(0L, 1L), 5, 2)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(layout)) => s
      }
      assert(scans.nonEmpty, "no file scan over the layout found in the plan")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "cell")),
          s"cell predicate did not reach the partition filters: " +
            s"${s.partitionFilters}")
        val totalFiles = spark.read.parquet(layout).inputFiles.length
        val readFiles = s.metrics("numFiles").value
        assert(readFiles < totalFiles,
          s"scan read $readFiles of $totalFiles files — no pruning happened")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("streaming append equals the batch append move") {
    val stream = SparkEntry.queries("streaming_ann_append")(spark, sf)
    val batch = SparkEntry.queries("ann_index_append")(spark, sf)
    assert(stream.count() > 0)
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty,
      "foreachBatch assignment must equal the batch append exactly")
  }
}
