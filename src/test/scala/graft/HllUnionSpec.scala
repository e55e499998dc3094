package graft

import graft.ops.SketchOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HLL merge law on the real fixture: registers built per day and
  * MAX-merged are IDENTICAL to registers built over the whole stream —
  * the associativity that makes daily sketches a lossless persisted
  * artifact for any later rollup.
  */
class HllUnionSpec extends AnyFunSuite with SparkTestBase {

  test("per-day registers MAX-merge to exactly the global registers") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val merged = SketchOps.hllRegisters(ev, col("d"), col("user_id"), 64)
      .groupBy(col("bucket")).agg(max(col("r")).cast("int").as("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val global = SketchOps
      .hllRegisters(ev, lit("all"), col("user_id"), 64)
      .select(col("bucket"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == global,
      "daily-merged registers must equal the directly-built global ones")
  }
}
