package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebra of the feature-hashing embedder: fixed dim, unit norm,
  * token-order invariance, and the sign trick actually producing both
  * signs. The DuckDB oracle pins exact values; this pins the contract.
  * The property section drives the same laws over GENERATED token bags
  * (fixed-seed ScalaCheck, same discipline as OhlcPropertySpec) so they
  * hold for arbitrary vocabularies, not just the fixture corpus. */
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

  // ------------------------------------------------------------------
  // Property section — generated token bags, fixed seeds (the
  // scalatest-scalacheck bridge isn't in the offline dependency set,
  // so generators are driven directly, as in OhlcPropertySpec).
  // ------------------------------------------------------------------

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val docGen: Gen[List[String]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, wordGen))

  private def embed(rows: Seq[(Long, String)]): Map[Long, Option[Seq[Double]]] =
    SimilarityOps.hashEmbed(docs(rows), 16).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap

  test("property: every generated doc embeds to unit L2 norm or null") {
    (1L to 5L).foreach { seed =>
      val texts = sample(Gen.listOfN(40, docGen), seed)
        .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      val out = embed(texts)
      assert(out.size == texts.size, s"seed $seed: every doc_id retained")
      out.foreach { case (id, v) =>
        v.foreach { vec =>
          assert(vec.length == 16)
          val n = math.sqrt(vec.map(x => x * x).sum)
          assert(math.abs(n - 1.0) < 1e-4, s"seed $seed doc $id: norm $n")
        }
      }
    }
  }

  test("property: embedding is permutation- and repetition-invariant") {
    (1L to 5L).foreach { seed =>
      val ws = sample(Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, wordGen)), seed)
      val shuffled = new scala.util.Random(seed).shuffle(ws)
      val base = embed(Seq(0L -> ws.mkString(" ")))(0L)
      // pure bag: token order contributes nothing
      assert(base == embed(Seq(0L -> shuffled.mkString(" ")))(0L),
        s"seed $seed: permutation changed the embedding")
      // doubling every count scales the raw vector; normalization
      // cancels the scale, so the embedding is repetition-invariant
      assert(base == embed(Seq(0L -> (ws ++ ws).mkString(" ")))(0L),
        s"seed $seed: doubled bag changed the normalized embedding")
    }
  }

  test("a fully-cancelling token bag yields a null vector") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // find two tokens in the same bucket with opposite signs using the
    // exact expressions hashEmbed applies
    val h = call_function("graft_md5long60", col("token")) %
      graft.functions.Hashing.Mersenne31
    val toks = (0 until 400).map(i => s"w$i").toDF("token")
      .select(col("token"), (h % 16).cast("int").as("bucket"),
        (lit(1.0) - (shiftright(h, 15) % 2).cast("double") * 2.0).as("sign"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    val pair = (for {
      (t1, b1, s1) <- toks; (t2, b2, s2) <- toks
      if b1 == b2 && s1 == -s2
    } yield (t1, t2)).headOption
    assert(pair.nonEmpty, "no cancelling pair in 400 candidate tokens")
    val (t1, t2) = pair.get
    // t1 and t2 cancel exactly; so do any number of balanced copies
    assert(embed(Seq(0L -> s"$t1 $t2"))(0L).isEmpty)
    assert(embed(Seq(0L -> s"$t1 $t2 $t1 $t2"))(0L).isEmpty)
    // unbalanced copies do NOT cancel
    assert(embed(Seq(0L -> s"$t1 $t2 $t1"))(0L).nonEmpty)
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
