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
    val work = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_zip",
      java.lang.Integer.toHexString(dir.hashCode))
    val zipPath = work.resolve("landing/events.zip")
    if (!java.nio.file.Files.exists(zipPath)) {
      java.nio.file.Files.createDirectories(zipPath.getParent)
      val rows = Tables.events(s, dir)
        .filter(col("event_id") < 1000)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
        .collect() // fixture staging only — the operator under test is the read path
      val out = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(zipPath))
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
    }
    zipPath.getParent.toString
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
        .stripMargin.replace("\n", " "))
  )
}
