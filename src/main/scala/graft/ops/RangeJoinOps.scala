package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join. Spark's native plan for
  * `p.ts BETWEEN i.start AND i.end` is BroadcastNestedLoop — quadratic.
  * The scale path buckets both sides to a fixed grain: each interval
  * explodes to the buckets it covers, points map to their bucket, the
  * join becomes an equi-join on (key, bucket), and an exact containment
  * filter removes bucket-edge false positives. Cost is
  * O(points + Σ interval_spans/grain) with a normal hash shuffle —
  * the standard interval-join strategy in distributed engines.
  */
object RangeJoinOps {

  private def bucketOf(ts: Column, grainSec: Long): Column =
    (unix_micros(ts) / lit(grainSec * 1000000L)).cast("long")

  /** @param points    (key, ts, ...) rows
    * @param intervals (key, start, end, ...) rows, end inclusive
    * @return points joined with the interval(s) containing them */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      key: String, ts: String,
                      start: String, end: String,
                      grainSec: Long = 3600L): DataFrame = {
    val p = points.withColumn("__bucket", bucketOf(col(ts), grainSec))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(start), grainSec),
        bucketOf(col(end), grainSec))))
    p.join(i, Seq(key, "__bucket"))
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("__bucket")
  }
}
