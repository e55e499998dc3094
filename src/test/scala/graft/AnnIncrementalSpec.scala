package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental two-level-index maintenance: the append / hot-cell /
  * split-reassign moves must compose into a valid index state — the
  * invariants a production deployment relies on between full retrains.
  * Runs on the sf0.001 fixture with the same 4/5 historical split the
  * registered queries use.
  */
class AnnIncrementalSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val HotFactor = 1.5

  private lazy val nc =
    SimilarityOps.normalizedCorpus(Tables.embeddings(spark, sf)).cache()
  private lazy val hist = nc.filter(col("vec_id") % 5 =!= 0)
  private lazy val batch = nc.filter(col("vec_id") % 5 === 0)
  private lazy val superCents = SimilarityOps.ivfCentroidsNorm(hist, 4).cache()
  private lazy val children =
    SimilarityOps.ivf2Children(hist, superCents, 4).cache()
  private lazy val existing =
    SimilarityOps.ivf2AssignBatchNorm(hist, superCents, children).cache()
  private lazy val arriving =
    SimilarityOps.ivf2AssignBatchNorm(batch, superCents, children).cache()

  test("batch-assignment rule reproduces ivf2AssignNorm on the training corpus") {
    // One assignment rule for historical and arriving vectors: applied
    // to the corpus the quantizer was trained on, the frozen-index path
    // must equal the self-training path cell for cell.
    val viaBatch = existing.select(col("vec_id"), col("cell"))
    val viaSelf = SimilarityOps.ivf2AssignNorm(hist, superCents, 4)
      .select(col("vec_id"), col("cell"))
    assert(viaBatch.except(viaSelf).isEmpty && viaSelf.except(viaBatch).isEmpty)
  }

  test("append assigns every batch vector exactly once, corpus untouched") {
    assert(arriving.count() === batch.count())
    assert(arriving.select("vec_id").distinct().count() === batch.count())
    // every batch cell is a real child of the batch vector's super-cell
    val badParent = arriving.join(children,
      arriving("cell") === children("sub_id") &&
        arriving("scell") === children("scell"), "left_anti")
    assert(badParent.count() === 0)
  }

  test("append stats conserve vectors and split existing/arriving by origin") {
    val stats = SimilarityOps.ivf2AppendStats(existing, arriving, HotFactor)
      .cache()
    val tot = stats.agg(
      sum("n_existing").as("e"), sum("n_arriving").as("a"),
      sum("n_total").as("t")).head()
    assert(tot.getLong(0) === hist.count())
    assert(tot.getLong(1) === batch.count())
    assert(tot.getLong(2) === nc.count())
    // the flag is exactly the > HotFactor × mean rule
    val rows = stats.collect()
    val mean = rows.map(_.getAs[Long]("n_total")).sum.toDouble / rows.length
    rows.foreach { r =>
      val expect = if (r.getAs[Long]("n_total") > HotFactor * mean) 1L else 0L
      assert(r.getAs[Long]("needs_split") === expect,
        s"cell ${r.getAs[Long]("cell")}: flag mismatch")
    }
    // fixture non-vacuity: the maintenance path is actually exercised
    assert(rows.count(_.getAs[Long]("needs_split") == 1L) >= 1)
    assert(rows.count(_.getAs[Long]("needs_split") == 0L) >= 1)
  }

  private lazy val members = existing.unionByName(arriving)
    .join(nc, Seq("vec_id")).cache()
  private lazy val hot =
    SimilarityOps.ivf2AppendStats(existing, arriving, HotFactor)
      .filter(col("needs_split") === 1).select(col("cell")).cache()
  private lazy val updated = SimilarityOps.ivf2SplitHotCells(
    members.select(col("vec_id"), col("n_emb"), col("cell")),
    children, hot).cache()

  test("split replaces each hot cell with its two lowest member ids") {
    val hotSet = hot.collect().map(_.getLong(0)).toSet
    val updSet = updated.select("sub_id").collect().map(_.getLong(0)).toSet
    hotSet.foreach { c =>
      val ids = members.filter(col("cell") === c)
        .select("vec_id").collect().map(_.getLong(0)).sorted
      // a child centroid self-assigns (cosine 1 with itself), and every
      // non-centroid member id exceeds every centroid id of the scell
      // (children are the k2 LOWEST member ids), so the lowest member
      // of a hot cell is the old centroid itself: the split keeps it
      // and seeds the second-lowest as the new sibling cell
      assert(ids(0) === c, s"cell $c: lowest member isn't the centroid")
      assert(updSet.contains(ids(0)) && updSet.contains(ids(1)),
        s"cell $c: split seeds ${ids.take(2).toSeq} missing from children")
    }
    // non-hot children untouched
    val before = children.join(hot,
      children("sub_id") === hot("cell"), "left_anti")
    assert(before.except(updated).isEmpty,
      "an unsplit child row changed during the split")
    assert(updated.count() === children.count() + hotSet.size)
  }

  test("reassign preserves membership and the nearest-child invariant") {
    val fin = SimilarityOps.ivf2ReassignCells(
      members.select(col("vec_id"), col("n_emb"), col("scell"), col("cell")),
      updated, hot).cache()
    assert(fin.count() === nc.count())
    assert(fin.select("vec_id").distinct().count() === nc.count())
    // non-hot members kept their exact assignment
    val keepBefore = members.join(hot, Seq("cell"), "left_anti")
      .select(col("vec_id"), col("scell"), col("cell"))
    assert(keepBefore.except(fin).isEmpty)
    // hot members sit where a fresh frozen-index assignment against the
    // UPDATED children would put them (same super centroids, so the
    // public append API is the independent recompute)
    val hotIds = members.join(hot, Seq("cell"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expect = SimilarityOps.ivf2AssignBatchNorm(
      nc.filter(col("vec_id").isInCollection(hotIds)), superCents, updated)
    val got = fin.filter(col("vec_id").isInCollection(hotIds))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }
}
