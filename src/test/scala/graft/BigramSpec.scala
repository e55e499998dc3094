package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM-with-stupid-backoff semantics (ops.TextOps.bigramScores):
  * the distributed fit+score is recomputed by an INDEPENDENT pure-Scala
  * model on a synthetic corpus (the BpeSpec loop-equivalence
  * discipline), plus the structural laws of the per-language tercile
  * buckets.
  */
class BigramSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Synthetic corpus: ids chosen so BOTH md5 splits are populated
    * (bucket < 90 = train, ≥ 90 = eval — corpus_split's convention);
    * the per-doc "uniq<i>" suffix guarantees held-out docs carry
    * transitions the train split never saw, so backoff fires. */
  private val baseTexts = Seq(
    "the cat sat on the mat", "the cat ran", "a dog sat on a log",
    "the dog ran fast", "zebras never sat here", "the mat sat still",
    "cat and dog and cat", "on the log on the mat")

  private def docText(i: Int): String =
    baseTexts(i % baseTexts.size) + s" uniq$i"

  private lazy val corpus =
    (0 until 64).map { i =>
      (i.toLong, if (i % 2 == 0) "en" else "xx", docText(i))
    }.toDF("doc_id", "lang", "text")

  private def md5Bucket(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  test("synthetic corpus populates both splits and the backoff path") {
    val buckets = (0L until 64L).map(md5Bucket)
    assert(buckets.count(_ < 90) > 0 && buckets.count(_ >= 90) > 0)
    val scored = TextOps.bigramScores(corpus).collect()
    assert(scored.map(_.getAs[Long]("n_backoff")).sum > 0,
      "no transition ever backed off — the held-out path is untested")
  }

  test("distributed scores equal an independent in-memory stupid-backoff model") {
    val docs = (0 until 64).map { i =>
      (i.toLong, docText(i).split("\\s+").toSeq)
    }
    val train = docs.filter { case (id, _) => md5Bucket(id) < 90 }
    val evalD = docs.filter { case (id, t) =>
      md5Bucket(id) >= 90 && t.size >= 2 }
    val uni = train.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val big = train.flatMap(_._2.sliding(2).filter(_.size == 2))
      .map(p => (p(0), p(1))).groupBy(identity).view.mapValues(_.size)
    val n = train.map(_._2.size).sum.toDouble
    val v = uni.size.toDouble
    def lp(w1: String, w2: String): BigDecimal = BigDecimal(
      math.log(big.get((w1, w2)) match {
        case Some(c12) => c12.toDouble / uni(w1)
        case None => 0.4 * (uni.getOrElse(w2, 0) + 1) / (n + v)
      })).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expect = evalD.map { case (id, t) =>
      val lps = t.sliding(2).filter(_.size == 2)
        .map(p => lp(p(0), p(1))).toSeq
      id -> ((lps.size.toLong,
        (lps.sum / lps.size).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }.toMap
    val got = TextOps.bigramScores(corpus).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nt, avg) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_trans") == nt)
      assert(math.abs(r.getAs[Double]("avg_lp") - avg) < 1e-9,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Double]("avg_lp")} vs $avg")
    }
  }

  test("model head: counts descend, lp = ln(c12/c1) against train unigrams") {
    val m = TextOps.bigramModel(corpus, topN = 20).collect()
    val counts = m.map(_.getAs[Long]("c12"))
    assert(counts.sameElements(counts.sortBy(-_)))
    val train = (0 until 64)
      .filter(i => md5Bucket(i.toLong) < 90)
      .flatMap(i => docText(i).split("\\s+"))
    val uni = train.groupBy(identity).view.mapValues(_.size)
    m.foreach { r =>
      val exp = BigDecimal(math.log(
        r.getAs[Long]("c12").toDouble / uni(r.getAs[String]("w1"))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("lp") - exp) < 1e-12)
    }
  }

  test("buckets: per-language terciles differ by ≤1 in size and order by score") {
    val b = TextOps.pplBuckets(corpus).collect()
    b.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val sizes = rows.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.length).toMap
      if (rows.length >= 3) {
        assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
        val head = rows.filter(_.getAs[String]("bucket") == "head")
          .map(_.getAs[Double]("avg_lp"))
        val tail = rows.filter(_.getAs[String]("bucket") == "tail")
          .map(_.getAs[Double]("avg_lp"))
        assert(head.min >= tail.max,
          "a head doc scored below a tail doc in the same language")
      }
    }
  }
}
