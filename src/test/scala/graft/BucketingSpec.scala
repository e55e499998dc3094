package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-design check (SURVEY.md §4): the reference's B-tree indexes
  * map to layout — bucketed tables give co-located joins with NO shuffle
  * exchange, the Spark equivalent of an indexed join path.
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("co-bucketed join plans without a shuffle exchange") {
    // warehouse.dir is a static conf — use the default (cwd/spark-warehouse,
    // gitignored) and drop the tables afterwards
    val t = ops.TickOps.normalizeEvents(
      Tables.events(spark, "/root/testdata/sf0.001"))

    t.write.mode("overwrite")
      .bucketBy(8, "symbol").sortBy("symbol")
      .saveAsTable("ticks_bucketed")
    ops.TickOps.dailyOhlc(t).write.mode("overwrite")
      .bucketBy(8, "symbol").sortBy("symbol")
      .saveAsTable("daily_bucketed")

    val joined = spark.table("ticks_bucketed").as("t")
      .join(spark.table("daily_bucketed").as("d"), Seq("symbol"))
      .groupBy(col("symbol")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(joined.count() > 0)
    // both sides arrive pre-clustered on the join key: the only allowed
    // movement is the final single-partition collect, no hash exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected bucket-co-located join without shuffle, got:\n$plan")

    spark.sql("DROP TABLE IF EXISTS ticks_bucketed")
    spark.sql("DROP TABLE IF EXISTS daily_bucketed")
  }

  test("warehouse DDL is idempotent and appends accumulate (S8/S9)") {
    // CREATE TABLE IF NOT EXISTS twice — second is a no-op, like the
    // reference's retried DDL (data_platform_final.py:188-212)
    spark.sql("DROP TABLE IF EXISTS graft_wh")
    spark.sql("CREATE TABLE IF NOT EXISTS graft_wh (symbol STRING, price DOUBLE) USING parquet")
    spark.sql("CREATE TABLE IF NOT EXISTS graft_wh (symbol STRING, price DOUBLE) USING parquet")
    val t = ops.TickOps.normalizeEvents(
        Tables.events(spark, "/root/testdata/sf0.001"))
      .select("symbol", "price")
    // transactional batch append (S8): two appends accumulate exactly
    t.write.mode("append").saveAsTable("graft_wh")
    t.write.mode("append").saveAsTable("graft_wh")
    assert(spark.table("graft_wh").count() == 2 * t.count())
    spark.sql("DROP TABLE IF EXISTS graft_wh")
  }

  test("graft functions are SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_md5long60('hello') AS h, " +
        "graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_shingles('a b c d', 3) AS sh")
      .collect().head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2) == Seq("a b c", "b c d"))
  }
}
