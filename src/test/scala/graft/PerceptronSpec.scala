package graft

import graft.ops.PerceptronOps
import org.scalatest.funsuite.AnyFunSuite

/** Batch-perceptron invariants on known tiny corpora: the feature
  * contract (hashed counts + bias), the exact first-epoch update
  * (w₁ = Σ y·x — every row is "misclassified" at w = 0), and
  * convergence on a separable task (once every margin is positive the
  * weights are a fixed point).
  */
class PerceptronSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "hello world hello"),
    (2L, "fr", "bonjour monde"),
    (3L, "en", "world peace"),
    (4L, "fr", "merci monde bien")
  ).toDF("doc_id", "lang", "text")

  test("feature vectors: hashed counts plus a trailing bias of 1") {
    val f = PerceptronOps.features(docs, "lang", "en", 8).collect()
    assert(f.length == 4)
    f.foreach { r =>
      val x = r.getSeq[Long](r.fieldIndex("x"))
      assert(x.length == 9, "expected dim+1 entries")
      assert(x.last == 1L, "bias feature must be 1")
      val nTokens = docs.filter($"doc_id" === r.getAs[Long]("doc_id"))
        .select(org.apache.spark.sql.functions.size(
          graft.ops.TextOps.tokens($"text"))).head().getInt(0)
      assert(x.init.sum == nTokens, "bucket counts must conserve token mass")
      val y = r.getAs[Long]("y")
      assert(y == 1L || y == -1L)
    }
  }

  test("epoch 1 from w=0 sums every row: w1 = sum of y*x") {
    val feats = PerceptronOps.features(docs, "lang", "en", 8)
    val w1 = PerceptronOps.train(feats, 1)
    val expected = feats.collect()
      .map(r => (r.getAs[Long]("y"), r.getSeq[Long](r.fieldIndex("x"))))
      .map { case (y, x) => x.map(_ * y).toArray }
      .reduce((a, b) => a.zip(b).map { case (p, q) => p + q })
    assert(w1.toSeq == expected.toSeq)
  }

  test("a separable task converges to a fixed point that classifies perfectly") {
    // two disjoint vocabularies — linearly separable in count space
    val sep = Seq(
      (1L, "en", "aa aa bb"), (2L, "en", "bb cc"), (3L, "en", "aa cc cc"),
      (4L, "fr", "xx yy"), (5L, "fr", "yy zz zz"), (6L, "fr", "xx xx zz")
    ).toDF("doc_id", "lang", "text")
    val feats = PerceptronOps.features(sep, "lang", "en", 16)
    val w = PerceptronOps.train(feats, 8)
    val applied = PerceptronOps.classify(feats, w).collect()
    assert(applied.forall(r => r.getAs[Int]("correct") == 1),
      "separable data must be classified perfectly after convergence")
    // fixed point: once all margins are positive the delta is zero
    val w2 = PerceptronOps.train(feats, 9)
    assert(w.toSeq == w2.toSeq, "converged weights must be a fixed point")
  }

  test("classify margins are the exact integer dot products") {
    val feats = PerceptronOps.features(docs, "lang", "en", 8)
    val w = PerceptronOps.train(feats, 3)
    val got = PerceptronOps.classify(feats, w).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("margin")).toMap
    feats.collect().foreach { r =>
      val x = r.getSeq[Long](r.fieldIndex("x"))
      val dot = x.zip(w).map { case (a, b) => a * b }.sum
      assert(got(r.getAs[Long]("doc_id")) == dot)
    }
  }
}
