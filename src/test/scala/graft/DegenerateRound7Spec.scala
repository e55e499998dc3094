package graft

import graft.ops.{CorpusOps, RelationalOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input edges for the round-7 operators: empty inputs,
  * all-zero vectors, null-adjacent values and single-class corpora must
  * degrade to empty/zero results, never crash — the posture
  * DegenerateInputSpec / DegenerateRound6Spec pin for earlier rounds.
  */
class DegenerateRound7Spec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("piiScan on empty text and on an empty frame") {
    val out = TextOps.piiScan(Seq((1L, "")).toDF("doc_id", "text")).collect()
    assert(out.length == 1 && out(0).getLong(5) == 0L) // n_pii
    assert(TextOps.piiScan(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() == 0)
  }

  test("piiScan counts adjacent repeated hits, not just one") {
    val r = TextOps.piiScan(Seq(
      (1L, "a@b.co c@d.org e@f.io")).toDF("doc_id", "text")).head
    assert(r.getLong(1) == 3L) // n_email
  }

  test("epochExpansion: null quality drops the doc (no epochs), not a crash") {
    val q = Seq((1L, "en", Some(0.5)), (2L, "en", None))
      .toDF("doc_id", "lang", "quality_score")
    val out = CorpusOps.epochExpansion(q, 8)
    // sequence(1, null) is null → explode drops the row, matching the
    // oracle's unnest(generate_series(1, NULL)) emitting nothing
    assert(out.filter(col("doc_id") === 2L).count() == 0)
    assert(out.filter(col("doc_id") === 1L).count() == 3)
  }

  test("covariancePairs on a single vector: zero covariance, not NaN") {
    val one = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = SimilarityOps.covariancePairs(one, 2).orderBy("i", "j").collect()
    assert(r.length == 3)
    assert(r.forall(x => x.getDouble(3) == 0.0 && x.getLong(2) == 1L))
  }

  test("covariancePairs on an empty table returns no rows") {
    val none = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(SimilarityOps.covariancePairs(none, 2).count() == 0)
  }

  test("hardNegativesNorm: single-class corpus yields no negatives") {
    val corpus = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0))).toDF("vec_id", "n_emb")
    val labels = Seq((0L, 7L), (1L, 7L)).toDF("vec_id", "label")
    assert(SimilarityOps
      .hardNegativesNorm(corpus, labels, Seq(0L), 5).count() == 0)
  }

  test("hardNegativesNorm: k larger than the cross-label pool truncates") {
    val corpus = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
      (2L, Array(0.6, 0.8))).toDF("vec_id", "n_emb")
    val labels = Seq((0L, 0L), (1L, 1L), (2L, 1L)).toDF("vec_id", "label")
    val out = SimilarityOps.hardNegativesNorm(corpus, labels, Seq(0L), 99)
    assert(out.count() == 2)
  }

  test("DQ expectation aggregates detect planted violations") {
    // the fixture is clean (all checks pass there); prove the checks
    // actually FIRE by running the same aggregate shapes on dirty rows
    val dirty = Seq(
      (Some(1L), Some(10.0)), (None, Some(-3.0)), (Some(2L), None)
    ).toDF("user_id", "value")
    val r = dirty.agg(
      sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_viol"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_viol"),
      count(col("value")).as("n_value_checked")).head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 2L)
    // uniqueness: count − distinct flags the duplicate key
    val dup = Seq(1L, 2L, 2L).toDF("k")
      .agg((count(lit(1)) - countDistinct(col("k"))).as("v")).head
    assert(dup.getLong(0) == 1L)
    // referential integrity: the orphan child is the null-parent row
    val child = Seq(10L, 11L).toDF("ck")
    val parent = Seq(10L).toDF("pk")
    val orphans = child.join(parent, col("ck") === col("pk"), "left")
      .agg(sum(when(col("pk").isNull, 1L).otherwise(0L))).head.getLong(0)
    assert(orphans == 1L)
  }

  test("RRF fusion output: dense ranks, scores inside the (0, 3/61] band") {
    val r = SparkEntry.queries("ann_topk_rrf")(
      spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    val maxScore = 3.0 / 61 + 1e-9
    r.foreach { x =>
      val s = x.getAs[Double]("rrf_score")
      assert(s > 0.0 && s <= maxScore, s"rrf score $s out of band")
    }
    r.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rows.length))
    }
  }

  test("late-priority semi join: no late lineitems → empty, not error") {
    val orders = Seq((1L, 10L, java.sql.Timestamp.valueOf("1996-08-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val punctual = Seq((1L, java.sql.Timestamp.valueOf("1996-08-05 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    assert(RelationalOps.latePriorityOrders(
      orders, punctual, "1996-07-01", "1996-10-01", 60).count() == 0)
    // one late item is enough, and the order counts once even with two
    val late = Seq(
      (1L, java.sql.Timestamp.valueOf("1996-11-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("1996-12-01 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val r = RelationalOps.latePriorityOrders(
      orders, late, "1996-07-01", "1996-10-01", 60).collect()
    assert(r.length == 1 && r(0).getLong(1) == 1L)
  }
}
