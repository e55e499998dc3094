package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** File-level quality semantics: the reference coerces bad VALUES to null
  * (P3); Spark extends the same philosophy to bad ROWS via parse modes.
  * PERMISSIVE (null + corrupt-record capture) is the pipeline default —
  * QC reports over _corrupt_record replace silent data loss.
  */
class CsvQualitySpec extends AnyFunSuite with SparkTestBase {

  private lazy val csvPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    val f = dir.resolve("ticks.csv")
    java.nio.file.Files.writeString(f,
      """event_id,event_type,value
        |1,click,1.5
        |2,view,junk
        |3,error,2.25
        |notanumber,click,3.0
        |4,purchase,
        |5
        |6,signup,4.75
        |""".stripMargin)
    f.toString
  }

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE: bad fields null out, raw line captured for QC") {
    val df = spark.read.option("header", "true").option("mode", "PERMISSIVE")
      .schema(schema).csv(csvPath).cache()
    assert(df.count() == 7)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
    // rows with an unparseable field keep the raw line for the QC report
    assert(corrupt.count() == 3) // 'junk' value, 'notanumber' id, short row
    // parseable fields survive even on corrupt rows
    assert(df.filter(col("event_id") === 2L).count() == 1)
    // fully-valid rows: empty value is a legal null, not corruption
    assert(df.filter(col("_corrupt_record").isNull).count() == 4)
    df.unpersist()
  }

  test("DROPMALFORMED and FAILFAST give the strict alternatives") {
    val strictSchema = StructType(schema.fields.dropRight(1))
    val dropped = spark.read.option("header", "true")
      .option("mode", "DROPMALFORMED").schema(strictSchema).csv(csvPath)
    // collect, not count(): CSV count() skips field parsing entirely
    // (count pushdown), so malformed rows would never be detected
    assert(dropped.collect().length == 4)
    val failing = spark.read.option("header", "true")
      .option("mode", "FAILFAST").schema(strictSchema).csv(csvPath)
    intercept[org.apache.spark.SparkException] { failing.collect() }
  }
}
