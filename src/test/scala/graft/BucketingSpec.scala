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
}
