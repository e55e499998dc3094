package graft

import graft.ops.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch guarantees on a known stream: the estimate never
  * undercounts, a collision-free width recovers exact counts, and a
  * colliding width overcounts by exactly the colliding mass.
  */
class CmsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val docs = Seq(
    (1L, "a a a a b b c"),
    (2L, "a b d")
  ).toDF("doc_id", "text") // counts: a=5 b=3 c=1 d=1

  test("CMS estimate is never below the exact count (min-over-rows bound)") {
    val r = TextOps.cmsTokenEstimates(docs, 4, 2, 10).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getLong(2) >= x.getLong(1),
        s"CMS undercounted ${x.getString(0)}")
      assert(x.getLong(3) == x.getLong(2) - x.getLong(1))
    }
  }

  test("a collision-free width recovers exact counts (overcount 0)") {
    // 4 distinct tokens into w=4096 buckets over 4 rows: the chance any
    // row collides for every one of the 4 rows is nil with these fixed
    // hashes — and this asserts the actual fixed-hash behavior, so a
    // hash-family change that breaks spread fails here
    val r = TextOps.cmsTokenEstimates(docs, 4, 4096, 10).collect()
    assert(r.length == 4)
    r.foreach(x => assert(x.getLong(3) == 0L,
      s"unexpected overcount for ${x.getString(0)}"))
    val exact = r.map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(exact == Map("a" -> 5L, "b" -> 3L, "c" -> 1L, "d" -> 1L))
  }

  test("join-size estimate upper-bounds the exact size; collision-free width is exact") {
    // A: keys 1,1,1,2,2,3  B: keys 1,2,2,4 → |A ⋈ B| = 3·1 + 2·2 = 7
    val a = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 4L).toDF("k")
    val exact = 7L
    // wide sketch: 4 distinct keys in 4096 buckets — no collisions with
    // the fixed hash family, so the inner product IS the exact size
    val wide = graft.ops.SketchOps
      .cmsJoinSizeEst(a, $"k", b, $"k", 4, 4096)
      .collect()(0).getLong(0)
    assert(wide == exact, s"collision-free estimate $wide != $exact")
    // squeezed sketch (w=2): collisions add cross terms — the estimate
    // must still never undercount
    val tight = graft.ops.SketchOps
      .cmsJoinSizeEst(a, $"k", b, $"k", 4, 2)
      .collect()(0).getLong(0)
    assert(tight >= exact, s"sketch undercounted: $tight < $exact")
  }

  test("fused multi-key counters equal the per-key counter tables bit-for-bit") {
    // the join_size_est fusion contract: one scan per TABLE must build
    // the SAME d×w counters the per-(pair, side) form built — any
    // drift in the hash family, tag conditional, or zero-fill breaks
    // the oracle, so pin equality per tag on a two-key table
    import org.apache.spark.sql.functions.{col, coalesce, lit}
    val t = Seq((1L, 10L), (1L, 20L), (2L, 20L), (3L, 30L))
      .toDF("k1", "k2")
    val fused = graft.ops.SketchOps
      .cmsMultiKeyCounters(t, Seq("k1" -> col("k1"), "k2" -> col("k2")),
        4, 64)
    Seq("k1", "k2").foreach { k =>
      val single = graft.ops.SketchOps
        .cmsKeyCounters(t, col(k), 4, 64)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val multi = fused
        .select(col("row_i"), col("bucket"),
          coalesce(col(s"c_$k"), lit(0L)).as("c"))
        .filter(col("c") > 0)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(multi == single, s"fused counters drifted for $k")
    }
  }

  test("total sketch mass per row equals the stream length") {
    // conservation: every hash row's counters sum to N tokens — the
    // property that makes sketches mergeable across partitions.
    // Asserted on the ACTUAL counter table (w=2 — both buckets carry
    // partial mass), not on probe exact counts, which only restate the
    // token counts.
    val toks = docs.selectExpr(
      "explode(split(trim(text), '\\\\s+')) AS token")
    val n = toks.count()
    val d = 4
    val perRow = TextOps.cmsCounters(toks, d, 2)
      .groupBy("row_i")
      .agg(org.apache.spark.sql.functions.sum("c").as("mass"))
      .collect()
    assert(perRow.length == d, "a hash row emitted no counters")
    perRow.foreach(r => assert(r.getAs[Long]("mass") == n,
      s"row ${r.getAs[Int]("row_i")} mass ${r.getAs[Long]("mass")} != $n"))
  }
}
