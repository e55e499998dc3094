package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Zip-archive ingest (the reference's extract stage,
  * /root/reference/data_platform_final.py:53-59) — Spark-native: archives
  * are read as binary files (distributed scan, one task per archive),
  * decompressed per partition on executors, and the entries' CSV bytes
  * parsed against an explicit schema. No driver-side IO: at 100 TB of
  * zipped landing files this scales with the number of archives, and the
  * downstream plan is a normal DataFrame.
  *
  * (Unzip must be imperative — zip is not splittable — so this is the
  * one legitimate mapPartitions use in the ingest path, per the
  * custom-operator ladder's last rung.)
  */
object ZipSource {

  /** Read every entry of every *.zip under `path` as (archive, entry,
    * bytes). */
  def readZipEntries(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (archive, bytes) =>
          val zin = new java.util.zip.ZipInputStream(
            new java.io.ByteArrayInputStream(bytes))
          Iterator.continually(zin.getNextEntry)
            .takeWhile(_ != null)
            .filterNot(_.isDirectory)
            .map { entry =>
              val out = new java.io.ByteArrayOutputStream()
              val buf = new Array[Byte](8192)
              var n = zin.read(buf)
              while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
              (archive, entry.getName, out.toByteArray)
            }.toList
        }
      }
      .toDF("archive", "entry", "bytes")
  }

  /** Unzip + parse CSV entries (header row, explicit schema — the
    * reference's schema discipline, SURVEY.md §1.3). */
  def readZippedCsv(spark: SparkSession, path: String,
                    schema: StructType): DataFrame = {
    import spark.implicits._
    val lines = readZipEntries(spark, path)
      .select(col("bytes").cast("string").as("text"))
      .as[String]
      .flatMap(_.split("\n").iterator.drop(1).filter(_.nonEmpty)) // drop header
      .toDF("line")
    spark.read.schema(schema)
      .csv(lines.as[String](org.apache.spark.sql.Encoders.STRING))
  }
}
