package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebra of the feature-hashing embedder: fixed dim, unit norm,
  * token-order invariance, and the sign trick actually producing both
  * signs. The DuckDB oracle pins exact values; this pins the contract. */
class HashEmbedSpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("vectors have the requested dim and unit L2 norm") {
    val out = SimilarityOps.hashEmbed(
      Tables.documents(spark, "/root/testdata/sf0.001").limit(100), 16)
      .filter(col("n_emb").isNotNull).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == 16)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"norm $n for ${r.getLong(0)}")
    }
  }

  test("embedding is a pure bag: token order does not matter") {
    val a = SimilarityOps.hashEmbed(
      docs(Seq(1L -> "alpha beta gamma")), 16).collect()(0).getSeq[Double](1)
    val b = SimilarityOps.hashEmbed(
      docs(Seq(1L -> "gamma alpha beta")), 16).collect()(0).getSeq[Double](1)
    assert(a == b)
  }

  test("the sign trick produces negative components") {
    val out = SimilarityOps.hashEmbed(
      Tables.documents(spark, "/root/testdata/sf0.001"), 16)
      .filter(col("n_emb").isNotNull)
      .select(explode(col("n_emb")).as("x"))
    assert(out.filter(col("x") < 0).count() > 0,
      "no negative components — the sign bit is not being applied")
  }

  test("identical texts embed identically; ANN finds the planted twin") {
    val corpus = docs(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "totally unrelated words about database engines",
      3L -> "the quick brown fox jumps over the lazy dog"))
    val emb = SimilarityOps.hashEmbed(corpus, 16)
      .filter(col("n_emb").isNotNull)
    val top = SimilarityOps.bruteForceTopKNorm(emb, Seq(1L), 1).collect()
    assert(top.length == 1 && top(0).getLong(1) == 3L &&
      top(0).getDouble(2) == 1.0,
      s"planted twin must rank first at cosine 1.0, got ${top.toSeq}")
  }
}
