package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for plan/stage timing investigations (runMain). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS probe_ticks")
    val ticks = graft.ops.TickOps.normalizeEvents(graft.Tables.events(spark, dir))
      .withColumn("trade_date", to_date(col("event_ts")))
    ticks.write.partitionBy("trade_date")
      .bucketBy(8, "symbol").sortBy("symbol").saveAsTable("probe_ticks")
    val day2 = ticks.filter(col("trade_date") === "2024-01-02")
      .withColumn("price", col("price") * 2)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val cols = spark.table("probe_ticks").columns
    day2.select(cols.map(col): _*).write.mode("overwrite").insertInto("probe_ticks")
    val a = spark.table("probe_ticks").filter(col("trade_date") === "2024-01-02")
      .agg(sum("price")).first().getDouble(0)
    val b = ticks.filter(col("trade_date") === "2024-01-02")
      .agg(sum(col("price") * 2)).first().getDouble(0)
    println(s"[probe] doubled a=$a b=$b relerr=${math.abs(a - b) / b}")
    spark.sql("DROP TABLE IF EXISTS probe_ticks")
    spark.stop()
  }
}
