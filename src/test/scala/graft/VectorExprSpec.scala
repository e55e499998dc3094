package graft

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass L2 normalize must be bit-identical to the
  * declarative HOF formulation (which is what the DuckDB oracle
  * mirrors) — on real fixture vectors and on edge shapes.
  */
class VectorExprSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("graft_l2norm is bit-identical to the HOF normalize on fixture embeddings") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val both = e.select(
      SimilarityOps.l2Normalize(col("embedding")).as("native"),
      SimilarityOps.l2NormalizeHof(col("embedding")).as("hof"))
    // element-wise EXACT double equality (bit parity, not tolerance)
    val diverging = both.filter(
      exists(zip_with(col("native"), col("hof"), (a, b) => a =!= b), x => x))
    assert(diverging.count() == 0)
  }

  test("graft_l2norm edge shapes: zero vector, empty array, null input") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(Seq(0.0f, 0.0f))), // zero vector: no direction -> null
      (2L, Some(Seq.empty[Float])), // empty stays empty
      (3L, None) // null row propagates null
    ).toDF("id", "v")
    val out = df.select(col("id"),
        SimilarityOps.l2Normalize(col("v")).as("n"),
        SimilarityOps.l2NormalizeHof(col("v")).as("h"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getSeq[Double](1)), Option(r.getSeq[Double](2)))).toMap
    assert(out(1)._1.isEmpty && out(1)._2.isEmpty)
    assert(out(2)._1.get.isEmpty && out(2)._2.get.isEmpty)
    assert(out(3)._1.isEmpty && out(3)._2.isEmpty)
  }
}
