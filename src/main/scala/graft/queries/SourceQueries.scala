package graft.queries

import graft.{Q, Tables}
import graft.ops.Determinism
import graft.sources.ZipSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format coverage: the reference's zip-archive extract stage
  * (S1) exercised end-to-end — a deterministic zipped-CSV landing file is
  * staged once, then ingested through the distributed binaryFile → unzip
  * → explicit-schema CSV parse path and aggregated; the oracle computes
  * the same aggregate from the original rows.
  */
object SourceQueries {

  private val csvSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Stage <workdir>/landing/events.zip from the first 1000 events
    * (idempotent per fixture dir). */
  private def stageZip(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val work = graft.util.Fs.workDir("graft_zip", dir)
    val zipPath = work.resolve("landing/events.zip")
    if (!java.nio.file.Files.exists(zipPath)) {
      val rows = Tables.events(s, dir)
        .filter(col("event_id") < 1000)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
        .collect() // fixture staging only — the operator under test is the read path
      val bytes = new java.io.ByteArrayOutputStream()
      val out = new java.util.zip.ZipOutputStream(bytes)
      out.putNextEntry(new java.util.zip.ZipEntry("events.csv"))
      val sb = new StringBuilder("event_id,event_type,value\n")
      rows.foreach { r =>
        sb.append(r.getLong(0)).append(',')
          .append(r.getString(1)).append(',')
          .append(r.getDouble(2)).append('\n')
      }
      out.write(sb.toString.getBytes("UTF-8"))
      out.closeEntry()
      out.close()
      graft.util.Fs.writeAtomic(zipPath, bytes.toByteArray)
    }
    zipPath.getParent.toString
  }

  /** Bhavcopy-style official-OHLC schema (reference S3:
    * data_platform_final.py:120-121 — the exchange's daily file). */
  private val bhavSchema = StructType(Seq(
    StructField("SYMBOL", StringType),
    StructField("DATE", DateType),
    StructField("OPEN", DoubleType),
    StructField("HIGH", DoubleType),
    StructField("LOW", DoubleType),
    StructField("CLOSE", DoubleType)))

  /** Stage <workdir>/bhav/official_ohlc.csv — an independent bhavcopy-
    * shaped daily-OHLC file (idempotent per fixture dir). Values are the
    * true daily bars, so the reconcile diffs are provably zero; the
    * operator under test is the second-source CSV ingest path.
    * Double round-trip is exact (shortest-repr toString). */
  private def stageBhavcopy(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val work = graft.util.Fs.workDir("graft_bhav", dir)
    val csvPath = work.resolve("bhav/official_ohlc.csv")
    if (!java.nio.file.Files.exists(csvPath)) {
      val rows = graft.ops.TickOps.dailyOhlc(
          graft.ops.TickOps.normalizeEvents(Tables.events(s, dir)))
        .orderBy("trade_date", "symbol")
        .collect() // fixture staging only — the operator under test is the read path
      val sb = new StringBuilder("SYMBOL,DATE,OPEN,HIGH,LOW,CLOSE\n")
      rows.foreach { r =>
        sb.append(r.getAs[String]("symbol")).append(',')
          .append(r.getAs[java.sql.Date]("trade_date").toString).append(',')
          .append(r.getAs[Double]("open")).append(',')
          .append(r.getAs[Double]("high")).append(',')
          .append(r.getAs[Double]("low")).append(',')
          .append(r.getAs[Double]("close")).append('\n')
      }
      // atomic publish: the existence check above must never observe a
      // partially-written file from a killed earlier run
      graft.util.Fs.writeAtomic(csvPath, sb.toString.getBytes("UTF-8"))
    }
    csvPath.toString
  }

  /** JSON-lines landing schema: scalars + a nested struct, to exercise
    * schema-declared nested field access through the JSON scan. */
  private val jsonSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("meta", StructType(Seq(
      StructField("bucket", LongType))))))

  /** Stage <workdir>/json/events.jsonl from the first 1000 events
    * (idempotent per fixture dir). Doubles round-trip exactly
    * (shortest-repr toString ↔ JSON parse); bucket = event_id % 7 is
    * oracle-reproducible. */
  private def stageJson(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val work = graft.util.Fs.workDir("graft_json", dir)
    val jsonPath = work.resolve("json/events.jsonl")
    if (!java.nio.file.Files.exists(jsonPath)) {
      val rows = Tables.events(s, dir)
        .filter(col("event_id") < 1000)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
        .collect() // fixture staging only — the operator under test is the read path
      val sb = new StringBuilder
      rows.foreach { r =>
        val v = if (r.isNullAt(2)) "null" else r.getDouble(2).toString
        sb.append("{\"event_id\":").append(r.getLong(0))
          .append(",\"event_type\":\"").append(r.getString(1))
          .append("\",\"value\":").append(v)
          .append(",\"meta\":{\"bucket\":").append(r.getLong(0) % 7)
          .append("}}\n")
      }
      // atomic publish — see stageBhavcopy
      graft.util.Fs.writeAtomic(jsonPath, sb.toString.getBytes("UTF-8"))
    }
    jsonPath.getParent.toString
  }

  val all: Seq[Q] = Seq(
    Q("zip_ingest",
      (s, dir) => {
        val landing = stageZip(s, dir)
        ZipSource.readZippedCsv(s, landing, csvSchema)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            Determinism.exactSum(col("value")).as("sum_value"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
          .orderBy("event_type")
      },
      s"""SELECT event_type, count(*) AS n_rows,
         |${Determinism.sqlExactSum("value")} AS sum_value,
         |min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events WHERE event_id < 1000
         |GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),

    // JSON-lines source (engine widening beyond the reference's CSV/zip):
    // explicit schema — no inference pass, the production discipline for
    // a landing zone — including a nested struct field read through the
    // scan and aggregated.
    Q("json_ingest",
      (s, dir) => {
        val landing = stageJson(s, dir)
        s.read.schema(jsonSchema).json(landing)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            Determinism.exactSum(col("value")).as("sum_value"),
            sum(col("meta.bucket")).as("sum_bucket"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
          .orderBy("event_type")
      },
      s"""SELECT event_type, count(*) AS n_rows,
         |${Determinism.sqlExactSum("value")} AS sum_value,
         |CAST(SUM(event_id % 7) AS BIGINT) AS sum_bucket,
         |min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events WHERE event_id < 1000
         |GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),

    // ORC source/sink round-trip (third columnar surface next to
    // parquet/CSV): Spark-written ORC read back with an explicit schema
    // and aggregated; the oracle recomputes from the original rows, so
    // the compare proves the format round-trip is lossless.
    Q("orc_ingest",
      (s, dir) => {
        val work = graft.util.Fs.workDir("graft_orc", dir).toString
        val orcDir = s"$work/events_orc"
        // idempotence guard on _SUCCESS, not the directory: a directory
        // write is non-atomic, and a killed first run would otherwise
        // leave a partial staging every later run silently reads
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$orcDir/_SUCCESS"))) {
          graft.util.Fs.deleteRec(orcDir)
          Tables.events(s, dir)
            .filter(col("event_id") < 1000)
            .select(col("event_id"), col("event_type"), col("value"))
            .write.orc(orcDir)
        }
        s.read.schema(csvSchema).orc(orcDir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            Determinism.exactSum(col("value")).as("sum_value"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
          .orderBy("event_type")
      },
      s"""SELECT event_type, count(*) AS n_rows,
         |${Determinism.sqlExactSum("value")} AS sum_value,
         |min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events WHERE event_id < 1000
         |GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),

    // Schema-evolution read (the landing-zone reality at 100 TB: the
    // producer added a column mid-history and old files stay as
    // written): two parquet generations — v1 (event_id, value) and v2
    // (+ category) — unified by mergeSchema; v1 rows surface a NULL
    // category. The oracle recomputes the union from the original rows,
    // proving both the merge and the null back-fill. mergeSchema costs a
    // footer read per file at planning; for a stable production schema,
    // pin the merged schema explicitly instead.
    Q("parquet_schema_merge",
      (s, dir) => {
        val root = graft.util.Fs.workDir("graft_schevo", dir).toString
        val (v1, v2) = (s"$root/v1", s"$root/v2")
        if (!java.nio.file.Files.exists(
            java.nio.file.Paths.get(s"$v2/_SUCCESS"))) {
          graft.util.Fs.deleteRec(v1); graft.util.Fs.deleteRec(v2)
          val ev = Tables.events(s, dir).filter(col("event_id") < 1000)
          ev.filter(col("event_id") < 500)
            .select(col("event_id"), col("value")).write.parquet(v1)
          ev.filter(col("event_id") >= 500)
            .select(col("event_id"), col("value"),
              col("event_type").as("category")).write.parquet(v2)
        }
        s.read.option("mergeSchema", "true").parquet(v1, v2)
          .groupBy(col("category"))
          .agg(count(lit(1)).as("n_rows"),
            Determinism.exactSum(col("value")).as("sum_value"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
          .orderBy("category")
      },
      s"""SELECT CASE WHEN event_id < 500 THEN NULL ELSE event_type END
         |  AS category,
         |count(*) AS n_rows,
         |${Determinism.sqlExactSum("value")} AS sum_value,
         |min(event_id) AS min_id, max(event_id) AS max_id
         |FROM events WHERE event_id < 1000
         |GROUP BY 1 ORDER BY category NULLS FIRST"""
        .stripMargin.replace("\n", " ")),

    // S3 end-to-end: tick-derived daily OHLC reconciled against a
    // genuinely SEPARATE source — a bhavcopy-shaped official CSV read
    // through the explicit-schema CSV scan (the reference's
    // tick-vs-bhavcopy ground-truth check, data_platform_final.py:120-172,
    // with a real second table instead of a re-derivation).
    Q("ohlc_reconcile_official",
      (s, dir) => {
        val official = s.read.option("header", "true").schema(bhavSchema)
          .csv(stageBhavcopy(s, dir))
          .select(col("DATE").as("trade_date"), col("SYMBOL").as("symbol"),
            col("OPEN").as("open"), col("HIGH").as("high"),
            col("LOW").as("low"), col("CLOSE").as("close"))
        val daily = graft.ops.TickOps.dailyOhlc(
          graft.ops.TickOps.normalizeEvents(Tables.events(s, dir)))
        graft.ops.QualityOps.reconcile(daily, official,
            Seq("trade_date", "symbol"))
          .orderBy("trade_date", "symbol")
      },
      s"""SELECT trade_date, symbol,
         |open - open AS open_diff, high - high AS high_diff,
         |low - low AS low_diff, close - close AS close_diff
         |FROM (${TickQueries.dailySql})
         |ORDER BY trade_date, symbol""".stripMargin.replace("\n", " "))
  )
}
