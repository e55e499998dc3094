package graft

import graft.ops.{BpeOps, WordPieceOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece trainer + apply semantics (ops.WordPieceOps): the
  * likelihood-ratio selection law (vs BPE's frequency-greedy), the
  * "##" continuation convention, determinism, and chain ≡ trainer-fold
  * equivalence on the applied corpus.
  */
class WordPieceSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("selection: likelihood ratio prefers the cohesive rare pair BPE ignores") {
    // (x, ##y) co-occurs every time either part appears (ratio 3/(3·3))
    // while (a, ##q)/(q, ##b) are frequent but predictable (90/(100·90));
    // BPE picks a count-90 pair, WordPiece must pick the cohesive one.
    val wf = Seq(("ab", 10L), ("aq", 90L), ("qb", 90L), ("xy", 3L))
    val wp = WordPieceOps.train(wf, 1)
    assert(wp.head.left == "x" && wp.head.right == "##y",
      s"WordPiece picked ${wp.head}")
    val bpe = BpeOps.train(wf, 1)
    assert(Set("a", "q").contains(bpe.head.left),
      s"BPE baseline drifted: ${bpe.head}")
    // score bookkeeping: floor(3·10^12 / (3·3))
    assert(wp.head.score == 3L * WordPieceOps.Scale / 9L)
    assert(wp.head.count == 3L)
  }

  test("merging keeps the left prefix, strips the right; interior pieces stay ##") {
    val wf = Seq(("hello", 5L))
    val ms = WordPieceOps.train(wf, 4)
    assert(ms.nonEmpty)
    ms.foreach { m =>
      assert(m.right.startsWith("##"), s"right of $m lost its prefix")
    }
    // the fused symbol of a word-initial merge is plain; interior fused
    // symbols keep ##
    ms.foreach { m =>
      val fused = m.left + m.right.drop(2)
      if (m.left.startsWith("##")) assert(fused.startsWith("##"))
      else assert(!fused.startsWith("##"))
    }
  }

  test("training is deterministic and the apply chain matches the trainer's fold") {
    val wf = Seq(("banana", 5L), ("bandana", 3L), ("nab", 2L))
    assert(WordPieceOps.train(wf, 8) == WordPieceOps.train(wf, 8))

    // fold the merges over each word exactly as the trainer does, then
    // check the Spark-side expression chain produces the same spaced form
    val ms = WordPieceOps.train(wf, 8)
    def spacedWord(w: String) = " " + w.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c }.mkString(" ") + " "
    val expect = wf.map { case (w, _) =>
      ms.foldLeft(spacedWord(w)) { (s, m) =>
        val pat = s" ${m.left} ${m.right} "
        val rep = s" ${m.left}${m.right.drop(2)} "
        s.replace(pat, rep).replace(pat, rep)
      }.trim
    }
    val got = wf.map(_._1).toDF("text")
      .select(trim(WordPieceOps.applyMerges(
        WordPieceOps.spacedDoc(col("text")), ms)).as("s"))
      .as[String].collect().toSeq
    assert(got == expect, s"$got vs $expect")
  }

  test("tokenizeStats: token counts, fertility, boundary exclusion") {
    val docs = Seq((1L, "banana nab"), (2L, ""), (3L, "banana"))
      .toDF("doc_id", "text")
    val ms = WordPieceOps.train(Seq(("banana", 5L), ("nab", 2L)), 16)
    val rows = WordPieceOps.tokenizeStats(docs, ms)
      .orderBy("doc_id").collect()
    // full-merge vocabulary: both words collapse to one piece each
    assert(rows(0).getAs[Long]("n_words") == 2)
    assert(rows(0).getAs[Long]("n_chars") == 9)
    assert(rows(0).getAs[Long]("n_wp_tokens") == 2)
    assert(rows(0).getAs[Double]("chars_per_token") == 4.5)
    // empty doc: zero tokens, null fertility (not a crash, not inf)
    assert(rows(1).getAs[Long]("n_wp_tokens") == 0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("chars_per_token")))
    assert(rows(2).getAs[Long]("n_wp_tokens") == 1)
  }
}
