package graft

import graft.ops.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the incremental (batch-vs-corpus) dedup screen, on a
  * planted synthetic corpus where every verdict is known by
  * construction. The fixture-scale hash-compare rides the DuckDB
  * oracle; this pins the asymmetric join semantics a refactor could
  * silently change (batch never pairs with batch, corpus never with
  * corpus, best-match tie-breaks).
  */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestBase {

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = df(Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "entirely different content about distributed query engines",
    3L -> "the quick brown fox jumps over the lazy dog again and again", // dup of 1
    4L -> "a b c d e f g h i j k l m n o p"))

  test("exact, near, and new verdicts are each produced correctly") {
    val batch = df(Seq(
      10L -> "the quick brown fox jumps over the lazy dog again and again", // exact dup of 1 (and 3)
      11L -> "the quick brown fox jumps over the lazy dog again and often", // near-dup of 1
      12L -> "completely novel text with no relation to anything stored"))
    val out = DedupOps.dedupIncremental(corpus, batch, 3, 16, 2, 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3, "one row per batch doc")

    val exactRow = out(10L)
    assert(exactRow.getLong(1) == 1L, "exact match attributes to MIN corpus doc_id")
    assert(!exactRow.getBoolean(4))

    val nearRow = out(11L)
    assert(nearRow.isNullAt(1), "near-dup is not an exact digest hit")
    assert(!nearRow.isNullAt(2) && Set(1L, 3L).contains(nearRow.getLong(2)))
    assert(nearRow.getDouble(3) >= 0.5)
    assert(!nearRow.getBoolean(4))

    val newRow = out(12L)
    assert(newRow.isNullAt(1) && newRow.isNullAt(2) && newRow.getBoolean(4))
  }

  test("near-match ties break to the smaller corpus doc_id") {
    // corpus docs 1 and 3 are identical → any near match of both has
    // equal jaccard; the reported match must be doc 1
    val batch = df(Seq(
      20L -> "the quick brown fox jumps over the lazy dog again and never"))
    val out = DedupOps.dedupIncremental(corpus, batch, 3, 16, 2, 0.5).collect()
    assert(out.length == 1)
    if (!out(0).isNullAt(2))
      assert(out(0).getLong(2) == 1L, s"tie must break to doc 1, got ${out(0)}")
  }

  test("streaming screen is invariant to micro-batch slicing") {
    // stage the sf0.001 documents as a 4-file parquet directory and
    // stream it one file per trigger: 4 micro-batches, each screened
    // independently — the union must equal the single-shot batch op
    val src = java.nio.file.Files
      .createTempDirectory("graft_inc_slice").toString
    Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    val work = s"$src/work"
    val streamed = graft.streaming.StreamingDedup
      .incrementalScreenAvailableNow(spark, src, work, 3, 16, 2, 0.5,
        maxFilesPerTrigger = Some(1))
    val docs = Tables.documents(spark, src)
    val batch = DedupOps.dedupIncremental(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0), 3, 16, 2, 0.5)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "micro-batch slicing changed the screen's results")
  }

  test("batch docs never pair with each other") {
    // two identical NEW docs in the batch: neither exists in the corpus,
    // so both must come back is_new despite being mutual duplicates —
    // within-batch dedup is exact/near dedup's job, not the screen's
    val batch = df(Seq(
      30L -> "twin payload not present in the historical corpus at all",
      31L -> "twin payload not present in the historical corpus at all"))
    val out = DedupOps.dedupIncremental(corpus, batch, 3, 16, 2, 0.5).collect()
    assert(out.length == 2 && out.forall(_.getBoolean(4)))
  }
}
