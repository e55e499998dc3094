package graft

import graft.ops.{MultimodalOps, SnapshotOps, TextOps, WordPieceOps}
import graft.util.Fs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate inputs for the round-11 operators: the bigram LM, the
  * change feed, vacuum, WordPiece, the Gopher composite, and the audio
  * fingerprint must degrade to principled empties/identities, never
  * crash or fabricate.
  */
class DegenerateRound11Spec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def md5Bucket(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  test("bigramScores on an empty frame: zero rows, full schema") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    val out = TextOps.bigramScores(empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "n_trans", "n_backoff", "avg_lp"))
  }

  test("bigramScores with no held-out docs: empty result, not a crash") {
    val trainOnly = (0L until 200L).filter(md5Bucket(_) < 90).take(8)
    assert(trainOnly.nonEmpty)
    val docs = trainOnly.map(i => (i, "en", "a b c d")).toDF(
      "doc_id", "lang", "text")
    assert(TextOps.bigramScores(docs).count() == 0)
  }

  test("bigramScores with an empty TRAIN split: finite or null, never a crash") {
    // every doc held out → N = V = 0 and every transition backs off
    // into 0.4·(0+1)/0; the scores must not crash the pipeline
    val evalOnly = (0L until 400L).filter(md5Bucket(_) >= 90).take(4)
    assert(evalOnly.nonEmpty)
    val docs = evalOnly.map(i => (i, "en", "a b c")).toDF(
      "doc_id", "lang", "text")
    val rows = TextOps.bigramScores(docs).collect()
    assert(rows.length == evalOnly.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_backoff") == r.getAs[Long]("n_trans"),
        "with no train split every transition must back off")
    }
  }

  test("change feed over an empty range and a single-commit log") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_snap_degen11"
    Fs.deleteRec(path)
    SnapshotOps.initTable(
      Seq((1L, "a", 1.0)).toDF("k", "s", "p"), path, "k")
    val sameV = SnapshotOps.tableChanges(spark, path, 0L, 0L, "k")
    assert(sameV.count() == 0)
    assert(sameV.columns.toSeq ==
      Seq("k", "v", "change_type", "s", "p"))
    // vacuum with only the base commit: nothing is unreachable
    assert(SnapshotOps.vacuum(path) == Seq.empty)
    assert(SnapshotOps.versions(path) == Seq(0L))
  }

  test("WordPiece on single-character words: no pairs, no merges, identity apply") {
    val wf = Seq(("a", 5L), ("b", 3L))
    assert(WordPieceOps.train(wf, 8).isEmpty)
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val stats = WordPieceOps.tokenizeStats(docs, Nil).head()
    assert(stats.getAs[Long]("n_wp_tokens") == 3)
    assert(stats.getAs[Long]("n_chars") == 3)
  }

  test("gopherRules: empty frame keeps schema; one-token doc passes repetition vacuously") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = TextOps.gopherRules(empty)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "r_word_count",
      "r_mean_word_len", "r_alpha_words", "r_stopwords", "r_repetition",
      "passes"))
    val one = TextOps.gopherRules(
      Seq((1L, "hello")).toDF("doc_id", "text")).head()
    assert(one.getAs[Int]("r_repetition") == 1)
    assert(one.getAs[Int]("r_word_count") == 0) // 1 token < 50
    assert(one.getAs[Int]("passes") == 0)
  }

  test("audio fingerprint of a clip shorter than one frame is 0, not a crash") {
    val pcm = new Array[Byte](2 * 10) // 10 samples < AfFrameW
    val wav = MultimodalOps.wavBytes(pcm, 8000)
    val media = Seq((1L, "audio/wav", wav))
      .toDF("media_id", "media_type", "payload")
    val r = MultimodalOps.audioFingerprint(media).head()
    assert(r.fp == 0L)
  }
}
