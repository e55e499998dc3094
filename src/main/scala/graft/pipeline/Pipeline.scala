package graft.pipeline

import graft.Tables
import graft.ops.{QualityOps, TickOps}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's DAG (E1 ingest → E2 quality → E3 warehouse/analytics)
  * as one lazy Spark program — SURVEY.md §3. No Airflow, no Postgres:
  * task boundaries become plan stages, the warehouse is a date-partitioned
  * parquet table (partition pruning replaces the B-tree indexes, §4), and
  * the per-file loops become input splits.
  *
  * E1 also exercises the CSV surface (S2/S7): the cleaned ticks round-trip
  * through header CSV with an explicit schema (no inference — S2's schema
  * discipline), mirroring the reference's csv→parquet conversion.
  */
object Pipeline {

  final case class Result(
      warehouseRows: Long, csvRoundtripRows: Long, invalidRows: Long,
      missingSymbols: Long, reconcileRows: Long, hourlyBars: Long,
      partitions: Long)

  private val tickCsvSchema = StructType(Seq(
    StructField("symbol", StringType),
    StructField("event_ts", TimestampType),
    StructField("price", DoubleType),
    StructField("trader_id", LongType),
    StructField("qty", DoubleType),
    StructField("event_id", LongType)))

  /** Run the full daily pipeline against a fixture dir; artifacts land
    * under `workDir`. Returns per-stage row counts (the QC report).
    *
    * Stage counts that correspond to a write ride that write as
    * `Observation` metrics — collected by the executors DURING the job,
    * so they cost zero extra actions/scans; only count-of-something-
    * never-written (csv read-back, missing keys, MV read-back,
    * partitions) goes through the one union-of-aggregates job. */
  def runDaily(spark: SparkSession, fixtureDir: String, workDir: String): Result = {
    // E1: ingest + normalize + day-partitioned parquet warehouse
    val obsWh = new org.apache.spark.sql.Observation("wh_rows")
    val ticks = TickOps.normalizeEvents(Tables.events(spark, fixtureDir))
      .withColumn("trade_date", to_date(col("event_ts")))
    // cluster rows by the partition column before the partitioned write:
    // one file per date instead of (#tasks × #dates) small files — the
    // standard small-files discipline for a partitioned warehouse
    ticks.observe(obsWh, count(lit(1)).as("n"))
      .repartition(col("trade_date"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("trade_date")
      .parquet(s"$workDir/warehouse/ticks")
    val warehouse = spark.read.parquet(s"$workDir/warehouse/ticks")

    // E1b: CSV round-trip with explicit schema (S2/S7 surface)
    ticks.drop("trade_date").limit(1000)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$workDir/export/ticks_csv")
    val csvBack = spark.read.option("header", "true")
      .schema(tickCsvSchema).csv(s"$workDir/export/ticks_csv")

    // E2: quality checks — three report branches off ONE cached scan
    // (the reference re-reads the raw files per check; here the warehouse
    // scan is shared and cached across the QC branches)
    warehouse.cache()
    val qcCols = Seq("price", "qty", "trader_id")
    val invalid = TickOps.invalidRows(warehouse, qcCols)
    // reference universe = observed symbols + a planted absent one, so the
    // bhavcopy-style missing-symbol report provably fires (expect 1)
    val universe = warehouse.select("symbol").distinct()
      .unionByName(spark.sql("SELECT 'GHOST' AS symbol"))
    val missing = QualityOps.missingKeys(
      universe, "symbol", warehouse.select("symbol"), "symbol")
    val daily = TickOps.dailyOhlc(warehouse)
    val hourly = TickOps.ohlcBars(warehouse, "1 hour")
    val official = hourly
      .groupBy(to_date(col("bar_start")).as("trade_date"), col("symbol"))
      .agg(min_by(col("open"), col("bar_start")).as("open"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        max_by(col("close"), col("bar_start")).as("close"))
    val recon = QualityOps.reconcile(daily, official, Seq("trade_date", "symbol"))
    val obsInvalid = new org.apache.spark.sql.Observation("invalid_rows")
    invalid.observe(obsInvalid, count(lit(1)).as("n"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$workDir/reports/invalid")
    val obsRecon = new org.apache.spark.sql.Observation("recon_rows")
    recon.observe(obsRecon, count(lit(1)).as("n"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$workDir/reports/reconcile")

    // E3: analytics materialization (the reference's MV → parquet table)
    hourly.write.mode(SaveMode.Overwrite)
      .parquet(s"$workDir/warehouse/hourly_ohlc")

    // Remaining counts (nothing wrote them): ONE union-of-aggregates job
    // — each branch collapses to a single row before the union, so the
    // driver fires one collect over four tiny partial aggregates (the
    // warehouse scan is still shared via the cache above)
    def labeled(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(label).as("k"), col("n"))
    val counts = labeled(csvBack, "csv")
      .unionByName(labeled(missing, "missing"))
      .unionByName(labeled(spark.read.parquet(s"$workDir/warehouse/hourly_ohlc"), "hourly"))
      .unionByName(warehouse.agg(countDistinct(col("trade_date")).as("n"))
        .select(lit("partitions").as("k"), col("n")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val result = Result(
      warehouseRows = obsWh.get("n").asInstanceOf[Long],
      csvRoundtripRows = counts("csv"),
      invalidRows = obsInvalid.get("n").asInstanceOf[Long],
      missingSymbols = counts("missing"),
      reconcileRows = obsRecon.get("n").asInstanceOf[Long],
      hourlyBars = counts("hourly"),
      partitions = counts("partitions"))
    warehouse.unpersist()
    result
  }

  /** The pipeline result as a one-row DataFrame (driver-contract shape). */
  def runDailyAsDf(spark: SparkSession, fixtureDir: String, workDir: String): DataFrame = {
    val r = runDaily(spark, fixtureDir, workDir)
    import spark.implicits._
    Seq(r).toDF()
  }
}
