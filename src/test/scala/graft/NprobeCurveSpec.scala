package graft

import org.scalatest.funsuite.AnyFunSuite

/** The nprobe tuning curve's defining monotonicity: more probed cells
  * can only ADD candidates, and a superset candidate pool can only
  * improve (never hurt) exact-rerank recall. Asserted on the live
  * fixture output.
  */
class NprobeCurveSpec extends AnyFunSuite with SparkTestBase {

  test("candidates and recall are non-decreasing in nprobe") {
    val rows = SparkEntry.queries("ann_nprobe_curve")(
      spark, "/root/testdata/sf0.001").collect()
      .sortBy(_.getAs[Int]("nprobe"))
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_candidates") >= a.getAs[Long]("n_candidates"))
      assert(b.getAs[Double]("mean_recall") >= a.getAs[Double]("mean_recall") - 1e-12,
        s"recall fell from ${a.getAs[Double]("mean_recall")} to ${b.getAs[Double]("mean_recall")}")
    }
  }
}
