package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixed-grid histogram quantile bound: the estimate (bucket lower
  * edge) can sit at most one grid step below the exact discrete
  * quantile, never above it by more than 0 — so |err| < grid width.
  * Asserted on the real fixture output, not a toy: every symbol's
  * p50/p95 error must be inside the 0.1 grid.
  */
class QuantileSketchSpec extends AnyFunSuite with SparkTestBase {

  test("sketch quantile error is bounded by the grid width on the fixture") {
    val rows = SparkEntry.queries("quantile_sketch_eval")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e50 = r.getAs[Double]("err_p50")
      val e95 = r.getAs[Double]("err_p95")
      assert(e50 < 0.1 + 1e-9, s"p50 err $e50 breaks the grid bound")
      assert(e95 < 0.1 + 1e-9, s"p95 err $e95 breaks the grid bound")
      // the bucket lower edge can never exceed the exact quantile
      assert(r.getAs[Double]("est_p50") <= r.getAs[Double]("exact_p50") + 1e-9)
      assert(r.getAs[Double]("est_p95") <= r.getAs[Double]("exact_p95") + 1e-9)
    }
  }
}
