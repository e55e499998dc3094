package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Head-to-head timing of the three candidate OHLC argmin/argmax
  * tie-break keys on the sf0.1 tick table (round-11 verdict item 2):
  * DECIMAL(38,0) scalar (round 10), (ts, id) STRUCT (round 11), and the
  * nondeterministic bare-ts baseline. Same session, alternating reps,
  * noop sink — isolates the per-row key cost inside the hash aggregate. */
object TieKeyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional arg: row multiplier (explode ×N with shifted ids) — the
    // per-row key cost only dominates the agg at millions of rows
    val mult = args.headOption.map(_.toInt).getOrElse(1)
    val base = graft.ops.TickOps.normalizeEvents(graft.Tables.events(spark, dir))
    val ticks = (if (mult == 1) base
      else base.crossJoin(spark.range(mult).toDF("copy"))
        .withColumn("event_id", col("event_id") * mult + col("copy"))
        .drop("copy")).cache()
    println(s"[tiekey] rows=${ticks.count()}")

    def ohlc(key: org.apache.spark.sql.Column) =
      ticks.groupBy(to_date(col("event_ts")).as("trade_date"), col("symbol"))
        .agg(min_by(col("price"), key).as("open"), max(col("price")).as("high"),
          min(col("price")).as("low"), max_by(col("price"), key).as("close"),
          count(lit(1)).as("n_ticks"))

    val decimalKey = unix_micros(col("event_ts")).cast(DecimalType(28, 0)) *
      lit(10000000000L) + col("event_id")
    val structKey = struct(unix_micros(col("event_ts")).as("k1"), col("event_id").as("k2"))

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[tiekey] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }
    for (rep <- 1 to 4) {
      time(s"decimal-$rep")(ohlc(decimalKey).write.format("noop").mode("overwrite").save())
      time(s"struct-$rep")(ohlc(structKey).write.format("noop").mode("overwrite").save())
      time(s"barets-$rep")(ohlc(col("event_ts")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
