package graft

import graft.sources.ZipSource
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-archive, multi-entry zip landing: every entry of every archive
  * lands, parallelism is one task per archive, and an empty archive or
  * directory entry contributes nothing (not a crash).
  */
class ZipSourceSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def writeZip(path: java.nio.file.Path,
                       entries: (String, String)*): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(path))
    entries.foreach { case (name, content) =>
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    out.close()
  }

  test("all entries of all archives union; empty/dir entries are inert") {
    val landing = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_zip_spec")
    graft.util.Fs.deleteRec(landing.toString)
    writeZip(landing.resolve("a.zip"),
      "one.csv" -> "id,name\n1,alpha\n2,beta\n",
      "two.csv" -> "id,name\n3,gamma\n")
    writeZip(landing.resolve("b.zip"),
      "sub/" -> "", // directory entry — must be skipped
      "three.csv" -> "id,name\n4,delta\n5,epsilon\n")
    writeZip(landing.resolve("empty.zip")) // zero entries — inert

    val entries = ZipSource.readZipEntries(spark, landing.toString)
    assert(entries.count() == 3) // 3 real CSV entries, no dir rows

    val df = ZipSource.readZippedCsv(spark, landing.toString, schema)
    val rows = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma",
      4L -> "delta", 5L -> "epsilon"))
  }
}
