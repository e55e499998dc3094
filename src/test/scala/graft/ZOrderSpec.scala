package graft

import graft.ops.LayoutOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Z-order layout claim, measured on written files: a single-column
  * sort prunes only its own column; the Morton-key layout gives every
  * file a bounded min/max box in BOTH dimensions, so point predicates on
  * EITHER column skip most files. The fixture is a full 64×64 grid so
  * the boxes are exact geometry, not data luck.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  test("z-order files prune on both dimensions; linear sort on one") {
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"),
      (col("id") / 64).cast("long").as("b"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    val linPath = s"$tmp/linear"
    val zPath = s"$tmp/zorder"
    df.repartitionByRange(8, col("a"))
      .sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(linPath)
    LayoutOps.writeZOrdered(df, zPath, col("a"), col("b"), 6, 8)

    def bounds(path: String) =
      LayoutOps.fileBounds(spark, path, "a", "b").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val lin = bounds(linPath)
    val zor = bounds(zPath)
    assert(lin.length == 8 && zor.length == 8)

    // a point predicate prunes by [min_a, max_a]; b by [min_b, max_b]
    def skipsA(bs: Array[(Long, Long, Long, Long)], v: Long) =
      bs.count { case (lo, hi, _, _) => v < lo || v > hi }
    def skipsB(bs: Array[(Long, Long, Long, Long)], v: Long) =
      bs.count { case (_, _, lo, hi) => v < lo || v > hi }

    // linear-by-a: near-perfect pruning on a, NOTHING on b
    assert(skipsA(lin, 10) >= 6, s"linear a-pruning broke: ${lin.toSeq}")
    assert(skipsB(lin, 10) == 0,
      s"single-column sort should not prune b: ${lin.toSeq}")
    // z-order: strong pruning on BOTH (files are ~32×16 boxes of the
    // 64×64 grid; range-sampling noise tolerated by the margins)
    assert(skipsA(zor, 10) >= 2, s"zorder a-pruning too weak: ${zor.toSeq}")
    assert(skipsB(zor, 10) >= 4, s"zorder b-pruning too weak: ${zor.toSeq}")
  }

  test("zValue bit-interleave round-trips the quadrant structure") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (63L, 63L), (32L, 16L))
      .toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"), 6).as("z"))
      .as[Long].collect().toSeq
    // hand-computed Morton codes (bit 2i from a, bit 2i+1 from b)
    assert(got == Seq(0L, 1L, 2L, 4095L,
      // a=32 -> bit5 -> z bit 10; b=16 -> bit4 -> z bit 9
      (1L << 10) | (1L << 9)))
  }

  test("zValueN guards its domain and wraps out-of-range inputs") {
    import spark.implicits._
    // static guards: bits >= 1, nDims*bits <= 63, >= 2 dims
    assertThrows[IllegalArgumentException] {
      LayoutOps.zValueN(Seq(col("a"), col("b")), 0)
    }
    assertThrows[IllegalArgumentException] {
      LayoutOps.zValueN(Seq(col("a"), col("b"), col("c")), 22) // 66 > 63
    }
    assertThrows[IllegalArgumentException] {
      LayoutOps.zValueN(Seq(col("a")), 8)
    }
    assertThrows[IllegalArgumentException] {
      LayoutOps.sqlZValueN(Seq("a", "b", "c"), 22)
    }
    // negative / oversized values wrap via pmod instead of interleaving
    // sign-extension garbage: -1 ≡ 63, 64 ≡ 0 (mod 2^6)
    val got = Seq((-1L, 64L)).toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"), 6).as("z"))
      .as[Long].collect().toSeq
    val expect = Seq((63L, 0L)).toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"), 6).as("z"))
      .as[Long].collect().toSeq
    assert(got == expect)
  }

  test("3-D z-order files prune on all three dimensions") {
    // full 16x16x16 grid: every file's box geometry is exact, not luck
    val df = spark.range(4096).select(
      (col("id") % 16).as("a"),
      ((col("id") / 16) % 16).cast("long").as("b"),
      (col("id") / 256).cast("long").as("c"))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_zorder3").toString
    // repartitionByRange SAMPLES split points (default ~100/partition);
    // on a 4096-row fixture the sampled boundaries can smear an octant
    // across two files and flake the geometry asserts — sample the whole
    // fixture so the boundaries are the exact quantiles
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val savedSample = spark.conf.getOption(sampleKey)
    spark.conf.set(sampleKey, "10000")
    try LayoutOps.writeZOrderedN(df, s"$tmp/z3",
      Seq(col("a"), col("b"), col("c")), 4, 8)
    finally savedSample match {
      case Some(v) => spark.conf.set(sampleKey, v)
      case None    => spark.conf.unset(sampleKey)
    }
    val bs = LayoutOps.fileBoundsN(spark, s"$tmp/z3", Seq("a", "b", "c"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(bs.length == 8)
    def skips(lo: Int, hi: Int, v: Long) =
      bs.count(t => v < t.productElement(lo).asInstanceOf[Long] ||
        v > t.productElement(hi).asInstanceOf[Long])
    // 8 files of a 3-D Morton curve ≈ the 2x2x2 octant split: a point
    // predicate on ANY single dimension skips ~half the files
    assert(skips(0, 1, 2) >= 3, s"a-pruning too weak: ${bs.toSeq}")
    assert(skips(2, 3, 2) >= 3, s"b-pruning too weak: ${bs.toSeq}")
    assert(skips(4, 5, 2) >= 3, s"c-pruning too weak: ${bs.toSeq}")
    // hierarchical single-column sort for contrast: nothing on c
    df.repartitionByRange(8, col("a"))
      .sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$tmp/lin")
    val lin = LayoutOps.fileBoundsN(spark, s"$tmp/lin", Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(5), r.getLong(6)))
    assert(lin.count { case (lo, hi) => 2L < lo || 2L > hi } == 0,
      "single-column sort should not prune c")
  }
}
