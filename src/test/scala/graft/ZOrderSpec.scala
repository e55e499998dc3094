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
}
