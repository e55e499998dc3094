package graft

import graft.ops.PcaOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA fit/apply guarantees: the published basis is orthonormal with
  * variance-ordered, sign-fixed components, and the projection's
  * empirical variance equals the published Rayleigh variance.
  */
class PcaSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val comps: Map[Int, Array[Double]] =
    SparkEntry.queries("pca_components")(spark, sf).collect()
      .groupBy(_.getAs[Int]("component"))
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getAs[Int]("i")).map(_.getAs[Double]("loading"))
      }

  private lazy val vars: Map[Int, Double] =
    SparkEntry.queries("pca_components")(spark, sf).collect()
      .map(r => r.getAs[Int]("component") -> r.getAs[Double]("explained_var"))
      .toMap

  test("published basis is orthonormal (within publication rounding)") {
    val ks = comps.keys.toSeq.sorted
    for (a <- ks; b <- ks) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-4,
        s"component $a norm² $dot != 1")
      else assert(math.abs(dot) < 1e-4,
        s"components $a,$b not orthogonal: $dot")
    }
  }

  test("explained variance is descending and positive") {
    val vs = vars.toSeq.sortBy(_._1).map(_._2)
    assert(vs.forall(_ > 0))
    vs.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b - 1e-9, s"variance order violated: $a < $b")
    }
  }

  test("sign convention: each component's largest |loading| is positive") {
    comps.values.foreach { q =>
      val mx = q.map(math.abs).max
      assert(q(q.indexWhere(x => math.abs(x) == mx)) > 0)
    }
  }

  test("projection variance matches the published Rayleigh variance") {
    val proj = SparkEntry.queries("embedding_pca_project")(spark, sf)
    vars.toSeq.sortBy(_._1).foreach { case (k, lam) =>
      val Array(row) = proj.agg(
        (sum(col(s"p$k") * col(s"p$k")) / count(lit(1))
          - pow(sum(col(s"p$k")) / count(lit(1)), 2)).as("v")).collect()
      val v = row.getDouble(0)
      assert(math.abs(v - lam) / lam < 0.02,
        s"component $k: projected variance $v vs published $lam")
    }
  }

  test("spectrum diagnostic and PCA-ANN recall eval agree (honest negative)") {
    // the applicability test dim-reduction retrieval ships with: a
    // near-flat spectrum (captured-variance fraction well under half)
    // must come WITH a weak recall eval — if either side moves without
    // the other, the diagnostic story is broken. The synthetic
    // embeddings are near-isotropic by construction, so both hold on
    // any regenerated fixture.
    val trace = ops.SimilarityOps.covariancePairs(
        Tables.embeddings(spark, sf), 16)
      .filter(col("i") === col("j"))
      .agg(sum(col("cov"))).head.getDouble(0)
    val captured = vars.values.sum
    val fraction = captured / trace
    assert(fraction > 0 && fraction < 0.5,
      f"fixture no longer near-isotropic (fraction $fraction%.3f) — " +
        "revisit the ann_topk_pca verdict note")
    val recalls = SparkEntry.queries("ann_recall_pca")(spark, sf)
      .select("recall_at_k").collect().map(_.getDouble(0))
    val mean = recalls.sum / recalls.length
    assert(mean < 0.6,
      f"PCA-ANN recall $mean%.2f no longer weak on a flat spectrum — " +
        "the diagnostic no longer predicts the eval")
  }

  test("fit is insensitive to upper-triangle row order") {
    val rows = ops.SimilarityOps.covariancePairs(
        Tables.embeddings(spark, sf), 16).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j"), r.getAs[Double]("cov")))
      .toSeq
    val a = PcaOps.fit(PcaOps.matrixFromUpper(rows, 16), 4, 100)
    val b = PcaOps.fit(PcaOps.matrixFromUpper(rows.reverse, 16), 4, 100)
    assert(a.components.flatten.toSeq == b.components.flatten.toSeq)
    assert(a.variances.toSeq == b.variances.toSeq)
  }
}
