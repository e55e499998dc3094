package graft

import graft.ops.{GraphOps, PerceptronOps, RelationalOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input coverage for the round-8 third-session operators:
  * identical snapshots, single-edge graphs, one-class training splits,
  * empty mutation sets — the edges a production run hits first.
  */
class DegenerateRound8cSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("snapshotDiff of identical tables is 100% unchanged") {
    val t = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v")
    val d = RelationalOps.snapshotDiff(t, t, "k").collect()
    assert(d.length == 1)
    assert(d.head.getString(0) == "unchanged" && d.head.getLong(1) == 2L)
  }

  test("snapshotDiff against an empty v2 reports everything removed") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val d = RelationalOps.snapshotDiff(t, t.filter(lit(false)), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("removed" -> 2L))
  }

  test("snapshotDiff treats null payload fields null-safely") {
    val v1 = Seq((1L, Option("a")), (2L, None: Option[String]))
      .toDF("k", "s")
    val v2 = Seq((1L, None: Option[String]), (2L, None: Option[String]))
      .toDF("k", "s")
    val d = RelationalOps.snapshotDiff(v1, v2, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // null == null must read as unchanged (null-safe compare), a real
    // null-vs-value difference as changed — not a silent drop
    assert(d == Map("unchanged" -> 1L, "changed" -> 1L))
  }

  test("pagerank on a single symmetric edge splits mass evenly") {
    val e = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val r = GraphOps.pagerank(e, 5).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set("a", "b"))
    assert(math.abs(r("a") - r("b")) < 1e-12)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("perceptron on a one-class split converges to always-that-class") {
    val docs = Seq((1L, "en", "aa bb"), (2L, "en", "cc"), (3L, "en", "aa"))
      .toDF("doc_id", "lang", "text")
    val feats = PerceptronOps.features(docs, "lang", "en", 8)
    val w = PerceptronOps.train(feats, 4)
    val applied = PerceptronOps.classify(feats, w).collect()
    // all labels +1: epoch 1 sums positive mass, every later margin is
    // positive, so training is a fixed point and everything is correct
    assert(applied.forall(_.getAs[Int]("correct") == 1))
  }

  test("perceptron features of an empty-text doc are bias-only") {
    val docs = Seq((1L, "en", "")).toDF("doc_id", "lang", "text")
    val f = PerceptronOps.features(docs, "lang", "en", 4).collect()
    assert(f.length == 1)
    val x = f.head.getSeq[Long](f.head.fieldIndex("x"))
    // split("") yields one empty token — it hashes to SOME bucket, so
    // total mass is 1 token + bias; what matters is the shape contract
    assert(x.length == 5 && x.last == 1L)
  }

  test("cmsJoinSizeEst of disjoint key sets can only report collisions") {
    val a = Seq(1L, 2L).toDF("k")
    val b = Seq(3L, 4L).toDF("k")
    val wide = graft.ops.SketchOps
      .cmsJoinSizeEst(a, $"k", b, $"k", 4, 4096)
      .collect()(0).getLong(0)
    assert(wide == 0L, s"disjoint sets at collision-free width must estimate 0, got $wide")
  }
}
