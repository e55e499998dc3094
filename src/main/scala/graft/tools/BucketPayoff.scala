package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the bucketed-warehouse payoff (runMain): the
  * symbol-bucketed catalog layout (warehouse_catalog's design) vs the
  * same data as plain parquet, on the SAME per-symbol agg + dim join
  * that query runs. The bucketed plan carries zero hash exchanges
  * (plan-asserted in PlanQualitySpec); this tool puts a wall-clock
  * number on that at scale — run with SPARK_GRAFT_SF_DIR pointing at
  * sf0.1 and a MakeScale x10 events fixture to see the gap grow with
  * data size.
  */
object BucketPayoff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(tag: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[bucket] $tag%-38s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows rows)")
      rows
    }

    val ticks = graft.ops.TickOps
      .normalizeEvents(graft.Tables.events(spark, dir))
      .withColumn("trade_date", to_date(col("event_ts")))
    val dim = graft.ops.TickOps.dailyOhlc(
      graft.ops.TickOps.normalizeEvents(graft.Tables.events(spark, dir)))

    // one-time landings: bucketed catalog tables vs plain parquet
    Seq("graft_bp_ticks", "graft_bp_daily").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.util.Fs.deleteRec(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") + s"/$t")
    }
    // 32 buckets = the harness's core count, so the bucketed scan gets
    // the same task parallelism as the plain scan and the comparison
    // isolates the exchange, not a parallelism handicap
    time("land bucketed (one-time)") {
      graft.ops.WarehouseOps.refreshCatalogTable(ticks, "graft_bp_ticks",
        nBuckets = 32)
      graft.ops.WarehouseOps.saveBucketedDim(dim, "graft_bp_daily",
        nBuckets = 32)
      spark.table("graft_bp_ticks").count()
    }
    val plainDir = java.nio.file.Files
      .createTempDirectory("graft_bp_plain").toString
    time("land plain parquet (one-time)") {
      ticks.write.mode("overwrite").parquet(s"$plainDir/ticks")
      dim.write.mode("overwrite").parquet(s"$plainDir/daily")
      spark.read.parquet(s"$plainDir/ticks").count()
    }

    // the measured shape: per-(symbol, day) agg + symbol-keyed dim join
    // — warehouse_catalog's exact movement
    def report(t: DataFrame, d: DataFrame): Long =
      t.groupBy(col("symbol"), col("trade_date"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price") * col("qty")).as("turnover"))
        .join(d, Seq("symbol"))
        .count()

    def bucketed(): Long =
      report(spark.table("graft_bp_ticks"), spark.table("graft_bp_daily"))
    def plain(): Long =
      report(spark.read.parquet(s"$plainDir/ticks"),
        spark.read.parquet(s"$plainDir/daily"))

    bucketed(); plain()
    time("bucketed agg+join (warm)")(bucketed())
    time("plain agg+join (warm)")(plain())
    time("bucketed agg+join (warm rep2)")(bucketed())
    time("plain agg+join (warm rep2)")(plain())

    // the shape where bucketing actually pays: a ROW-LEVEL join of two
    // large symbol-keyed tables (tick-grain reconcile on
    // (symbol, second)). Plain parquet must exchange BOTH full sides;
    // the co-bucketed layout satisfies the clustered distribution via
    // HashPartitioning(symbol) ⊆ join keys — local sort only, zero
    // exchange of raw rows.
    def reconcile(t1: DataFrame, t2: DataFrame): Long =
      t1.select(col("symbol"), date_trunc("second", col("event_ts")).as("sec"),
          col("price"))
        .join(t2.select(col("symbol"),
          date_trunc("second", col("event_ts")).as("sec"), col("qty")),
          Seq("symbol", "sec"))
        .count()

    def bigBucketed(): Long =
      reconcile(spark.table("graft_bp_ticks"), spark.table("graft_bp_ticks"))
    def bigPlain(): Long =
      reconcile(spark.read.parquet(s"$plainDir/ticks"),
        spark.read.parquet(s"$plainDir/ticks"))

    bigBucketed(); bigPlain()
    time("bucketed row-level join (warm)")(bigBucketed())
    time("plain row-level join (warm)")(bigPlain())
    time("bucketed row-level join (warm rep2)")(bigBucketed())
    time("plain row-level join (warm rep2)")(bigPlain())
    spark.stop()
  }
}
