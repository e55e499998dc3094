package graft

import graft.ops.{UnigramOps, UnigramPiece}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM trainer + apply semantics (ops.UnigramOps doc): seed
  * coverage, Viterbi tie-breaks, hard-EM determinism, lossless
  * round-trip, and the constant-plan executor apply at a
  * production-sized vocabulary.
  */
class UnigramSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val wf = Seq(("banana", 5L), ("bandana", 3L), ("nab", 2L))

  test("final vocabulary always contains every corpus character") {
    val model = UnigramOps.train(wf, seedMulti = 8, vocabSize = 10)
    val chars = wf.flatMap(_._1.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(model.map(_.piece).toSet),
      s"missing chars in ${model.map(_.piece)}")
  }

  test("training is deterministic across repeated runs") {
    val a = UnigramOps.train(wf)
    val b = UnigramOps.train(wf)
    assert(a == b)
  }

  test("viterbi prefers the higher-scoring segmentation, ties to the longer last piece") {
    // 'ab' and singles score equally -> tie at j=2 resolves to l=2
    val sc = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(UnigramOps.viterbi("ab", sc) == List("ab"))
    // a strictly better multi-piece beats singles
    val sc2 = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0)
    assert(UnigramOps.viterbi("abab", sc2) == List("ab", "ab"))
    // unsegmentable word fails loudly
    val e = intercept[IllegalArgumentException] {
      UnigramOps.viterbi("axb", Map("a" -> -1.0, "b" -> -1.0))
    }
    assert(e.getMessage.contains("not segmentable"))
  }

  test("tokenization is lossless: concatenating pieces recovers each word") {
    val model = UnigramOps.train(wf)
    val sc = model.map(m => m.piece -> m.logp).toMap
    wf.foreach { case (w, _) =>
      assert(UnigramOps.viterbi(w, sc).mkString == w, s"word $w")
    }
    // and on the real fixture vocabulary
    val words = graft.ops.BpeOps
      .wordFrequencies(Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val m2 = UnigramOps.train(words)
    val sc2 = m2.map(m => m.piece -> m.logp).toMap
    words.foreach { case (w, _) =>
      assert(UnigramOps.viterbi(w, sc2).mkString == w, s"word $w")
    }
  }

  test("corpus stats are ordered: words <= unigram tokens <= chars") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val stats = queries.Staged.uniTokStats(spark, "/root/testdata/sf0.001")
    val bad = stats.filter(col("n_unigram_tokens") < col("n_words") ||
      col("n_unigram_tokens") > col("n_chars")).count()
    assert(bad == 0)
    assert(stats.count() == docs.count())
    // multi-char pieces fire: compression is real, not char-splitting
    val any = stats.filter(col("n_unigram_tokens") < col("n_chars")).count()
    assert(any > 0, "unigram tokenization never beat char-splitting")
  }

  test("executor apply runs a production-sized vocabulary (constant plan size)") {
    // a synthetic 1k-piece model: the apply plan must not grow with the
    // vocabulary (the model rides a broadcast map, not the plan)
    val docs = Seq((1L, "abc xyz abc"), (2L, "zzzz")).toDF("doc_id", "text")
    val chars = ('a' to 'z').map(c =>
      UnigramPiece(c.toString, 10L, -3.0))
    val noise = (1 to 1000).map(i =>
      UnigramPiece(f"q$i%04d", 1L, -12.0)) // never matches: has digits
    val small = UnigramOps.tokenizeStatsUnigram(docs, chars)
    val big = UnigramOps.tokenizeStatsUnigram(docs, chars ++ noise)
    val smallPlan = small.queryExecution.executedPlan.toString.length
    val bigPlan = big.queryExecution.executedPlan.toString.length
    assert(math.abs(bigPlan - smallPlan) < 200,
      s"plan grew with vocabulary: $smallPlan -> $bigPlan")
    // identical stats: the noise pieces never win a segmentation
    assert(small.orderBy("doc_id").collect().toSeq ==
      big.orderBy("doc_id").collect().toSeq)
  }
}
