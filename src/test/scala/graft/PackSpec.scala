package graft

import graft.ops.CorpusOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence-packing invariants: token conservation, dense full
  * sequences, per-doc start bookkeeping, and the hierarchical prefix
  * sum's equality with the naive global window it replaces.
  */
class PackSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("hierarchical prefix sum equals the naive global window") {
    // uneven token counts across several buckets (width 4 here)
    val dt = (0L until 50L).map(i => (i * 3, 1L + (i * 7) % 13))
      .toDF("doc_id", "n")
    val fast = CorpusOps.packSpans(dt, 16L, bucketWidth = 4L)
      .select("doc_id", "o").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = dt.withColumn("o",
        coalesce(sum(col("n")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "o").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == naive)
  }

  test("all three prefix levels carry at a tiny width, still equal to naive cumsum") {
    // width 3 over doc_ids 0..599: ~200 buckets and ~67 super-buckets,
    // so the within-bucket, bucket-within-super, AND global super
    // windows all accumulate non-zero offsets — the decomposition must
    // still be bit-identical to the single global window
    val dt = (0L until 600L).filter(_ % 7 != 0)
      .map(i => (i, 1L + (i * 11) % 17)).toDF("doc_id", "n")
    val fast = CorpusOps.packSpans(dt, 32L, bucketWidth = 3L)
      .select("doc_id", "o", "s0", "s1").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val naive = dt.withColumn("o",
        coalesce(sum(col("n")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("o"),
        floor(col("o") / 32).cast("long").as("s0"),
        floor((col("o") + col("n") - 1) / 32).cast("long").as("s1"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(fast == naive)
  }

  test("shuffled packing equals the naive hash-order cumsum and really permutes") {
    val dt = (0L until 300L).filter(_ % 5 != 0)
      .map(i => (i, 1L + (i * 13) % 19)).toDF("doc_id", "n")
    // tiny buckets/width so every hierarchy level carries
    val fast = graft.ops.CorpusOps
      .packSpansShuffled(dt, 32L, nBuckets = 8L, bucketWidth = 2L)
      .select("doc_id", "o").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h = graft.functions.Hashing.md5Long(col("doc_id").cast("string"))
    val naive = dt
      .withColumn("o", coalesce(sum(col("n")).over(
        Window.orderBy((h % 8).asc, h.asc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("doc_id", "o").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == naive)
    // same total token mass as ordered packing (conservation), but a
    // genuinely different doc→offset assignment (a real permutation —
    // offsets themselves are prefix sums, so only the total and the
    // zero coincide across orders)
    val ns = dt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ordered = graft.ops.CorpusOps.packSpans(dt, 32L)
      .select("doc_id", "o").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def total(off: Map[Long, Long]) =
      off.map { case (d, o) => o + ns(d) }.max
    assert(total(fast) == total(ordered),
      "total token mass diverged between orders")
    assert(fast.values.min == 0L && ordered.values.min == 0L)
    assert(fast != ordered, "hash order did not actually shuffle")
  }

  test("manifest conserves tokens, fills every non-tail sequence, starts each doc once") {
    val manifest = SparkEntry.queries("corpus_pack_sequences")(spark, sf)
      .collect()
    assert(manifest.length > 3, "fixture produced too few sequences")
    val seqIds = manifest.map(_.getAs[Long]("seq_id"))
    assert(seqIds.toSeq == (0L until manifest.length.toLong),
      "sequence ids are not dense from 0")
    val fills = manifest.map(_.getAs[Long]("n_tokens"))
    val seqLen = fills.max
    assert(fills.dropRight(1).forall(_ == seqLen),
      "a non-tail sequence is not full")
    assert(fills.last <= seqLen)
    // conservation vs the tokenizer's own per-doc counts
    val totalBpe = SparkEntry.queries("corpus_tokenize")(spark, sf)
      .agg(sum(col("n_bpe_tokens"))).head.getLong(0)
    assert(fills.sum == totalBpe,
      s"packed ${fills.sum} tokens but corpus has $totalBpe")
    // each doc starts in exactly one sequence
    val nDocs = Tables.documents(spark, sf).count()
    assert(manifest.map(_.getAs[Long]("n_starts")).sum == nDocs)
    // boundary bookkeeping is real: some sequence holds a doc that
    // started earlier (n_docs > n_starts)
    assert(manifest.exists(r =>
      r.getAs[Long]("n_docs") > r.getAs[Long]("n_starts")),
      "no doc crosses a sequence boundary — shrink PackSeqLen")
  }

  test("materialized pack shards agree with the manifest and land in their shard") {
    val written = SparkEntry.queries("corpus_pack_write")(spark, sf)
    val manifest = SparkEntry.queries("corpus_pack_sequences")(spark, sf)
    assert(written.drop("pack_shard").except(manifest).isEmpty &&
      manifest.except(written.drop("pack_shard")).isEmpty,
      "read-back manifest diverges from the computed manifest")
    assert(written.filter(col("pack_shard") =!= (col("seq_id") % 8)).isEmpty,
      "a sequence landed in the wrong shard")
  }
}
