package graft

import graft.ops.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** Exact-substring span semantics on hand-built documents: maximal
  * merging along diagonals, multiple independent spans, position
  * correctness, the hot-gram cap, and pair orientation.
  */
class SubstringSpanSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], w: Int = 3,
                    maxDf: Int = 50) =
    DedupOps.substringSpans(docs.toDF("doc_id", "text"), w, maxDf)
      .orderBy("doc_a", "doc_b", "a_start", "b_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4)))

  test("a shared run merges into one maximal span with correct positions") {
    // shared run 'c d e f g' (5 tokens) at pos 2 in doc 1, pos 0 in doc 2
    val r = spans(Seq(
      (1L, "x y c d e f g z"),
      (2L, "c d e f g q r s")))
    assert(r.toSeq == Seq((1L, 2L, 2, 0, 5L)))
  }

  test("two independent shared runs yield two spans") {
    val r = spans(Seq(
      (1L, "a b c x x x d e f"),
      (2L, "a b c y y y d e f")))
    assert(r.toSeq == Seq((1L, 2L, 0, 0, 3L), (1L, 2L, 6, 6, 3L)))
  }

  test("a run repeated inside one doc matches on two diagonals") {
    val r = spans(Seq(
      (1L, "p q r z z z p q r"),
      (2L, "k p q r k k k k k")))
    assert(r.toSeq == Seq((1L, 2L, 0, 1, 3L), (1L, 2L, 6, 1, 3L)))
  }

  test("grams above the df cap are boilerplate and never pair") {
    // 'a b c' appears in 4 docs; cap 3 removes it entirely
    val docs = Seq(
      (1L, "a b c x"), (2L, "a b c y"), (3L, "a b c z"), (4L, "a b c w"))
    assert(spans(docs, w = 3, maxDf = 3).isEmpty)
    // with the cap lifted the 6 pairs appear
    assert(spans(docs, w = 3, maxDf = 50).length == 6)
  }

  test("pairs are oriented doc_a < doc_b and never self") {
    val r = spans(Seq(
      (5L, "m n o p q"), (2L, "m n o p q"), (9L, "m n o p q")))
    assert(r.forall(x => x._1 < x._2))
    assert(r.length == 3) // (2,5) (2,9) (5,9)
  }

  test("coverage merges overlapping and adjacent regions, counts each token once") {
    import org.apache.spark.sql.functions._
    // doc 1 vs docs 2 and 3: two overlapping shared runs in doc 1
    // ('c d e' at 2..4 and 'd e f' at 3..5 → one region 2..5), plus an
    // adjacent run ('g h i' at 6..8 → merges into 2..8)
    val docs = Seq(
      (1L, "x y c d e f g h i z"),
      (2L, "c d e q q q q q q q"),
      (3L, "q d e f q g h i q q")).toDF("doc_id", "text")
    val spans = DedupOps.substringSpans(docs, 3, 50)
    val tc = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val cov = DedupOps.substringCoverage(spans, tc)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_dup_tokens"),
        r.getAs[Long]("n_regions"), r.getAs[Double]("dup_frac"))).toMap
    // doc 1: region 2..5 (c d e f) + adjacent 6..8 (g h i) merge → 2..8
    assert(cov(1L) == ((7L, 1L, 0.7)), s"doc1 coverage was ${cov(1L)}")
    assert(cov(2L)._1 == 3L && cov(3L)._2 == 2L)
  }

  test("fixture yields the planted long spans") {
    val out = SparkEntry.queries("dedup_substring_spans")(
      spark, "/root/testdata/sf0.001")
    val lens = out.select("span_len").collect().map(_.getLong(0))
    assert(lens.nonEmpty, "no spans found — planted near-dups missing?")
    assert(lens.min >= 8, "a span shorter than the window width")
  }
}
