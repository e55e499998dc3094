package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed expectations for the round-7 additions: PII
  * detect/redact (TextOps.piiScan), epoch-weighted corpus expansion
  * (CorpusOps.epochExpansion), and the embedding covariance pass
  * (SimilarityOps.covariancePairs). The registered queries get their
  * cross-engine value check from the DuckDB oracle; these pin the
  * operator semantics on tiny literal inputs where the right answer is
  * computable by hand.
  */
class PiiEpochCovSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("piiScan counts each class and the redaction removes every hit") {
    val docs = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org, call 555-123-4567 now"),
      (2L, "host 192.168.0.1 card 4111 1111 1111 1111 ok"),
      (3L, "no pii here, just words and 1234 numbers")
    ).toDF("doc_id", "text")
    val r = graft.ops.TextOps.piiScan(docs).orderBy("doc_id").collect()
    assert(r(0) === Row(1L, 2L, 1L, 0L, 0L, 3L, r(0).getString(6)))
    assert(r(1) === Row(2L, 0L, 0L, 1L, 1L, 2L, r(1).getString(6)))
    assert(r(2) === Row(3L, 0L, 0L, 0L, 0L, 0L, r(2).getString(6)))
    // a doc with no PII keeps its original digest; docs with PII change
    val md5s = docs.select(col("doc_id"), md5(col("text")).as("m"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(r(2).getString(6) === md5s(2))
    assert(r(0).getString(6) !== md5s(0))
    // redacting an already-redacted doc is a fixed point (tags carry no
    // pattern-matching text)
    val redactedOnce = docs.select(col("doc_id"),
      graft.ops.TextOps.PiiPatterns.foldLeft(col("text")) {
        case (c, (_, re, tag)) => regexp_replace(c, re, tag)
      }.as("text"))
    val again = graft.ops.TextOps.piiScan(redactedOnce)
      .agg(sum("n_pii")).head.getLong(0)
    assert(again === 0L)
  }

  test("epochExpansion: floor(4q)+1 copies, all epochs present, shard stable") {
    val q = Seq(
      (1L, "en", 0.10), // 1 epoch
      (2L, "en", 0.50), // 3 epochs
      (3L, "de", 1.00)  // 5 epochs
    ).toDF("doc_id", "lang", "quality_score")
    val r = graft.ops.CorpusOps.epochExpansion(q, 8)
    val perDoc = r.groupBy("doc_id").count().orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(perDoc.toSeq === Seq((1L, 1L), (2L, 3L), (3L, 5L)))
    // epoch_idx is 1..n_epochs dense
    val epochs = r.filter(col("doc_id") === 3L)
      .select("epoch_idx").orderBy("epoch_idx").collect().map(_.getInt(0))
    assert(epochs.toSeq === (1 to 5))
    // shards deterministic and in range
    val shards = r.select("shard").collect().map(_.getInt(0))
    assert(shards.forall(s => s >= 0 && s < 8))
    val again = graft.ops.CorpusOps.epochExpansion(q, 8)
      .select("doc_id", "epoch_idx", "shard").collect().toSet
    assert(again === r.select("doc_id", "epoch_idx", "shard").collect().toSet)
  }

  test("covariancePairs matches hand-computed covariance on 3 vectors") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(2.0f, 1.0f)),
      (3L, Array(3.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val r = graft.ops.SimilarityOps.covariancePairs(emb, 2)
      .orderBy("i", "j").collect()
    // means: x̄=2, ȳ=2; cov(x,x)=2/3, cov(x,y)=1/3, cov(y,y)=2/3
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getLong(2))).toSeq ===
      Seq((0, 0, 3L), (0, 1, 3L), (1, 1, 3L)))
    assert(math.abs(r(0).getDouble(3) - 2.0 / 3) < 1e-5)
    assert(math.abs(r(1).getDouble(3) - 1.0 / 3) < 1e-5)
    assert(math.abs(r(2).getDouble(3) - 2.0 / 3) < 1e-5)
    // upper triangle only: d dims → d(d+1)/2 rows
    assert(graft.ops.SimilarityOps.covariancePairs(emb, 2).count() === 3L)
  }

  test("hardNegativesNorm: all mined negatives cross the label boundary " +
      "and are the nearest such") {
    // 2-D unit vectors on a circle, two labels interleaved by angle
    val vecs = (0 until 12).map { i =>
      val a = i * math.Pi / 6
      (i.toLong, Array(math.cos(a), math.sin(a)), (i % 2).toLong)
    }
    val corpus = vecs.map { case (id, v, _) => (id, v) }
      .toDF("vec_id", "n_emb")
    val labels = vecs.map { case (id, _, l) => (id, l) }
      .toDF("vec_id", "label")
    val r = graft.ops.SimilarityOps
      .hardNegativesNorm(corpus, labels, Seq(0L), 3)
      .orderBy("rank").collect()
    // query 0 has label 0; nearest label-1 vectors are its angular
    // neighbors 1 and 11 (cos 30° each), then 3 and 9 (cos 90°, tie →
    // lower id)
    assert(r.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 11L, 3L))
    assert(r.forall(_.getAs[Long]("n_label") === 1L))
    assert(r.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("bpe pair counting: char bigrams weighted by occurrence") {
    val docs = Seq((1L, "abab ab"), (2L, "ba")).toDF("doc_id", "text")
    val pairs = docs
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    // "abab" → ab, ba, ab; "ab" → ab; "ba" → ba
    assert(pairs === Map("ab" -> 3L, "ba" -> 2L))
  }

  test("standardizeDims: z-scores have mean 0 and variance 1 per dim") {
    val emb = Seq(
      (1L, Array(1.0f, 10.0f)), (2L, Array(2.0f, 20.0f)),
      (3L, Array(3.0f, 30.0f)), (4L, Array(4.0f, 40.0f))
    ).toDF("vec_id", "embedding")
    val z = graft.ops.SimilarityOps.standardizeDims(emb, 2)
    val stats = z.groupBy("i")
      .agg(avg("z").as("m"), avg(col("z") * col("z")).as("m2"))
      .collect()
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-5, s"mean off: $r")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-4, s"variance off: $r")
    }
    // constant dim → null z (zero variance), not a crash
    val const = Seq((1L, Array(5.0f)), (2L, Array(5.0f)))
      .toDF("vec_id", "embedding")
    val cz = graft.ops.SimilarityOps.standardizeDims(const, 1)
      .select("z").collect()
    assert(cz.length == 2 && cz.forall(_.isNullAt(0)))
  }

  test("covariance output never carries IEEE -0.0 (compare-harness trap)") {
    // two antisymmetric dims whose covariance rounds to zero from below
    val emb = Seq(
      (1L, Array(1e-9f, -1e-9f)),
      (2L, Array(-1e-9f, 1e-9f))
    ).toDF("vec_id", "embedding")
    val covs = graft.ops.SimilarityOps.covariancePairs(emb, 2)
      .select("cov").collect().map(_.getDouble(0))
    covs.foreach { c =>
      assert(java.lang.Double.doubleToRawLongBits(c) !=
        java.lang.Double.doubleToRawLongBits(-0.0),
        "negative zero leaked into registered output")
    }
  }
}
