package graft

import graft.ops.{BpeMerge, BpeOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer + apply semantics (ops.BpeOps doc): greedy merge
  * selection with integer counts and deterministic tie-breaks, two-pass
  * replace application, word-boundary isolation, and lossless
  * round-trip of the tokenization.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("trainer learns the dominant pair first and builds on merged symbols") {
    // freq-weighted pairs: (a,a)=2 from 'aa'x2 ... then 'ab' merges
    val merges = BpeOps.train(Seq(("aa", 2L), ("ab", 1L)), 4)
    assert(merges.map(m => (m.left, m.right, m.count)) ==
      Seq(("a", "a", 2L), ("a", "b", 1L)))
    // recursion onto merged symbols: 'abab' => ab+ab => abab
    val m2 = BpeOps.train(Seq(("abab", 3L)), 3)
    assert(m2.map(_.left + m2.head.right).nonEmpty)
    assert(m2.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", "ab")))
  }

  test("ties break on the lexicographically smallest combined key") {
    // (a,b) and (c,d) both count 1 -> (a,b) first
    val merges = BpeOps.train(Seq(("ab", 1L), ("cd", 1L)), 1)
    assert(merges.head.left == "a" && merges.head.right == "b")
  }

  test("trainer stops early when no adjacent pair remains") {
    assert(BpeOps.train(Seq(("a", 5L), ("b", 3L)), 8).isEmpty)
  }

  test("two-pass apply semantics: adjacent pair chains merge fully; runs pair up") {
    val docs = Seq((1L, "abab"), (2L, "aaaa")).toDF("doc_id", "text")
    val merges = Seq(BpeMerge(0, "a", "b", 0L), BpeMerge(1, "a", "a", 0L))
    val out = docs.select(col("doc_id"),
      trim(BpeOps.applyMerges(BpeOps.spacedDoc(col("text")), merges)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "ab ab", s"got '${out(1L)}'")
    assert(out(2L) == "aa aa", s"got '${out(2L)}'")
  }

  test("merges never cross word boundaries") {
    val docs = Seq((1L, "ca ab")).toDF("doc_id", "text")
    // merge (a, a) must not fuse the 'a' ending word 1 with the 'a'
    // starting word 2 across the | boundary
    val merges = Seq(BpeMerge(0, "a", "a", 0L))
    val s = docs.select(
      trim(BpeOps.applyMerges(BpeOps.spacedDoc(col("text")), merges)))
      .head.getString(0)
    assert(s == "c a | a b", s"boundary crossed: '$s'")
  }

  test("tokenization is lossless: stripping separators recovers the document") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val merges = queries.Staged.bpeMerges(spark, "/root/testdata/sf0.001", 16)
    assert(merges.nonEmpty)
    val rows = docs.select(col("text"),
      trim(BpeOps.applyMerges(BpeOps.spacedDoc(col("text")), merges)).as("s"))
      .collect()
    rows.foreach { r =>
      val original = r.getString(0).trim.split("\\s+").mkString(" ")
      val restored = r.getString(1).split(" \\| ")
        .map(_.replace(" ", "")).mkString(" ")
      assert(restored == original, "tokenize dropped or altered characters")
    }
  }

  test("executor-side merge loop equals the expression chain on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val merges = queries.Staged.bpeMerges(spark, dir, 16)
    val chain = SparkEntry.queries("corpus_tokenize")(spark, dir).collect()
    val loop = BpeOps.tokenizeStatsLoop(docs, merges)
      .orderBy("doc_id").collect()
    assert(chain.map(_.toString).toSeq == loop.map(_.toString).toSeq,
      "loop apply diverged from the expression chain")
  }

  test("merge loop runs a 1.1k-merge production-sized vocabulary (constant plan size)") {
    // synthetic but BPE-shaped model: each merge fuses two existing
    // vocabulary symbols and the result joins the vocabulary, so later
    // merges chain onto earlier outputs exactly like a trained table
    val vocab = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d", "e")
    val merges = (0 until 1100).map { i =>
      val l = vocab((i * 13 + 1) % vocab.length)
      val r = vocab((i * 31 + 7) % vocab.length)
      vocab += (l + r)
      BpeMerge(i, l, r, 1L)
    }
    // deterministic letter soup over the same 5-symbol alphabet
    def lcgText(seed: Long, len: Int): String = {
      var x = seed
      (0 until len).map { _ =>
        x = (x * 6364136223846793005L + 1442695040888963407L)
        val c = ('a' + math.floorMod(x >>> 33, 5L).toInt).toChar
        if (math.floorMod(x >>> 17, 11L) == 0L) s"$c " else s"$c"
      }.mkString.trim
    }
    val docs = (1L to 40L).map(i => (i, lcgText(i, 160))).toDF("doc_id", "text")
    val got = BpeOps.tokenizeStatsLoop(docs, merges).orderBy("doc_id")
      .select("doc_id", "tokens_digest", "n_bpe_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // reference: the trainer's own fold applied driver-side to the
    // identical spaced form (the pinned two-pass replace semantics)
    val spaced = docs.select(col("doc_id"),
        BpeOps.spacedDoc(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    got.foreach { case (id, digest, ntok) =>
      val ref = merges.foldLeft(spaced(id)) { (s, m) =>
        val (p, rep) = (s" ${m.left} ${m.right} ", s" ${m.left}${m.right} ")
        s.replace(p, rep).replace(p, rep)
      }.trim
      val refDigest = java.security.MessageDigest.getInstance("MD5")
        .digest(ref.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(digest == refDigest, s"doc $id digest mismatch")
      val refTok = ref.split(" ").count(x => x != "|" && x.nonEmpty)
      assert(ntok == refTok.toLong, s"doc $id token count mismatch")
      assert(ntok > 0)
    }
    // the merges actually bit: some doc compressed below its char count
    val chars = docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .head.getLong(0)
    assert(got.map(_._3).sum < chars, "1.1k merges produced no compression")
  }

  test("corpus stats are ordered: words <= bpe tokens <= chars, and compression is real") {
    val stats = SparkEntry.queries("corpus_tokenize")(
      spark, "/root/testdata/sf0.001").collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val (w, c, b) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_bpe_tokens"))
      assert(w <= b && b <= c, s"expected $w <= $b <= $c")
    }
    val totC = stats.map(_.getAs[Long]("n_chars")).sum.toDouble
    val totB = stats.map(_.getAs[Long]("n_bpe_tokens")).sum.toDouble
    assert(totC / totB > 1.2,
      f"16 merges compressed only ${totC / totB}%.3f chars/token")
  }
}
