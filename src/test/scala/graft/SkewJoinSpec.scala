package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join readiness: when one join key dominates, the runtime
  * must split the skewed partition instead of letting one task carry the
  * whole key. Thresholds are lowered so fixture-scale data exhibits the
  * 100 TB failure mode; the assertion is on the adaptive plan actually
  * taking the skew-split path.
  */
class SkewJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 200k-row fact side where one key owns 95% of the rows
      val fact = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit("HOT"))
            .otherwise(concat(lit("k"), (col("id") % 1000).cast("string")))
            .as("key"),
          col("id").as("v"))
      val dim = spark.range(2000)
        .select(concat(lit("k"), (col("id") % 1000).cast("string")).as("key"),
          col("id").as("w"))
        .unionByName(Seq(("HOT", -1L)).toDF("key", "w"))
      val joined = fact.join(dim, Seq("key"))
        .agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.toLowerCase.contains("skew"),
        s"expected AQE to mark/split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
