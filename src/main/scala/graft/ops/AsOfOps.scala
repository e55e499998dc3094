package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each probe row, the latest tick at-or-before its
  * timestamp, per key — the canonical financial lookup Spark has no
  * native operator for.
  *
  * Implementation is the scalable union-window composition (preference
  * (a) of SURVEY.md's custom-operator ladder): tag and union both sides,
  * sort within (key) by (ts, side), and carry the last non-null tick
  * value forward with an unbounded-preceding window. Cost is one shuffle
  * on the key + a per-partition sort — no range cross-join, no per-row
  * binary search, and it scales to arbitrarily dense probe grids. Rows
  * with no preceding tick drop out (inner as-of semantics, matching
  * DuckDB's ASOF JOIN).
  */
object AsOfOps {

  /** @param ticks  (key, ts, value) observations
    * @param probes (key, ts) lookup points
    * @return (key, probe ts, asof_value, asof_ts) — inner semantics */
  def asofJoin(ticks: DataFrame, probes: DataFrame,
               key: String, ts: String, value: String): DataFrame = {
    val t = ticks.select(col(key), col(ts),
      col(value).as("__v"), col(ts).as("__vts"), lit(0).as("__side"))
    val p = probes.select(col(key), col(ts),
      lit(null).cast(t.schema("__v").dataType).as("__v"),
      lit(null).cast("timestamp").as("__vts"), lit(1).as("__side"))
    // ties at equal ts: the tick (side 0) sorts before the probe, so a
    // tick exactly at the probe instant IS visible to it (ASOF >=)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.unionByName(p)
      .withColumn("asof_value", last(col("__v"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("__vts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("asof_value").isNotNull)
      .select(col(key), col(ts), col("asof_value"), col("asof_ts"))
  }

  /** The same as-of join through graft's custom whole-operator plan
    * (graft.plans.AsOfJoinNode → AsOfJoinExec): hash-cluster + in-
    * partition sort on both sides (planner-inserted, like SMJ), then a
    * linear per-partition merge. Registered as a runtime extra strategy
    * so it works under any driver-created session. */
  def asofJoinNative(ticks: DataFrame, probes: DataFrame,
                     key: String, ts: String, value: String): DataFrame = {
    val spark = ticks.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.PushFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.PushFilterThroughAsOfJoin
    val pPlan = probes.queryExecution.analyzed
    val tPlan = ticks.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = graft.plans.AsOfJoinNode(pPlan, tPlan,
      attr(pPlan, key), attr(pPlan, ts),
      attr(tPlan, key), attr(tPlan, ts), attr(tPlan, value))
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark, node)
  }
}
