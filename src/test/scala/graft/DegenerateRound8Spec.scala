package graft

import graft.ops.{BpeOps, CorpusOps, DedupOps, PcaOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate inputs for the round-8 operators: the tokenizer, packer,
  * PCA fit, substring-span, and mixture-sampling paths must degrade to
  * principled empties/identities, never crash or fabricate.
  */
class DegenerateRound8Spec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("BPE apply with an empty merge list is the plain spaced form") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val s = docs.select(trim(BpeOps.applyMerges(
      BpeOps.spacedDoc(col("text")), Nil))).head.getString(0)
    assert(s == "a b | c d")
  }

  test("tokenizeStats on an empty frame returns no rows with the full schema") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = BpeOps.tokenizeStats(empty,
      Seq(graft.ops.BpeMerge(0, "a", "b", 1L)))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("doc_id", "n_words", "n_chars",
      "n_bpe_tokens", "chars_per_token", "tokens_digest"))
  }

  test("empty-text docs tokenize to zero tokens with null compression") {
    // the uniform non-empty-token rule: "" must NOT become [""], whose
    // spaced form diverges between engines (Spark sequence(1,0)
    // descends; DuckDB string_split('','') is empty)
    val docs = Seq((1L, ""), (2L, "   "), (3L, "ab ab"))
      .toDF("doc_id", "text")
    val out = BpeOps.tokenizeStats(docs,
      Seq(graft.ops.BpeMerge(0, "a", "b", 1L))).orderBy("doc_id").collect()
    Seq(0, 1).foreach { i =>
      assert(out(i).getAs[Long]("n_words") == 0)
      assert(out(i).getAs[Long]("n_chars") == 0)
      assert(out(i).getAs[Long]("n_bpe_tokens") == 0)
      assert(out(i).isNullAt(out(i).fieldIndex("chars_per_token")),
        "division by zero tokens must be null, not inf/NaN")
    }
    assert(out(2).getAs[Long]("n_bpe_tokens") == 2)
  }

  test("packSpans drops zero-token docs and packs a single doc alone") {
    val dt = Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "n")
    val spans = CorpusOps.packSpans(dt, 16L).collect()
    assert(spans.length == 1 && spans.head.getLong(0) == 2L)
    val manifest = CorpusOps.packManifest(
      CorpusOps.packSpans(dt, 16L), 16L).collect()
    assert(manifest.length == 1 && manifest.head.getAs[Long]("n_tokens") == 5L)
  }

  test("packManifest on an empty span table is empty") {
    val dt = Seq.empty[(Long, Long)].toDF("doc_id", "n")
    assert(CorpusOps.packManifest(
      CorpusOps.packSpans(dt, 16L), 16L).count() == 0)
  }

  test("a doc spanning many sequences keeps exact per-sequence fills") {
    // one 100-token doc at L=16: 7 sequences, 16×6 + 4
    val dt = Seq((7L, 100L)).toDF("doc_id", "n")
    val m = CorpusOps.packManifest(CorpusOps.packSpans(dt, 16L), 16L)
      .orderBy("seq_id").collect()
    assert(m.length == 7)
    assert(m.map(_.getAs[Long]("n_tokens")).toSeq ==
      Seq(16L, 16L, 16L, 16L, 16L, 16L, 4L))
    assert(m.map(_.getAs[Long]("n_starts")).sum == 1L)
  }

  test("PCA fit on the zero matrix returns the sign-fixed start basis, variance 0") {
    val m = PcaOps.fit(Array.fill(4, 4)(0.0), 2, 10)
    assert(m.variances.toSeq == Seq(0.0, 0.0))
    assert(m.components(0).forall(_ == 0.5)) // 1/sqrt(4), sign-fixed +
  }

  test("substring spans: docs shorter than the window never pair") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(DedupOps.substringSpans(docs, 3, 50).count() == 0)
  }

  test("temperature mix on a single-language corpus selects exactly N/2") {
    val docs = (1L to 10L).map(i => (i, "only", s"t $i"))
      .toDF("doc_id", "lang", "text")
    val sel = CorpusOps.temperatureMix(docs, 0.5).collect()
    assert(sel.length == 5)
    assert(sel.forall(_.getAs[Long]("quota") == 5L))
  }

  test("streaming tokenize twin equals the batch tokenizer row for row") {
    val sf = "/root/testdata/sf0.001"
    val streamed = SparkEntry.queries("streaming_tokenize")(spark, sf)
    val batch = SparkEntry.queries("corpus_tokenize")(spark, sf)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
