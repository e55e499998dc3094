package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.MultimodalOps

/** Scratch probe: why is the audio codec chain superlinear on the x10
  * fixture? Times each stage separately at the dir in
  * SPARK_GRAFT_SF_DIR. */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    time("docs count")(docs.count())
    for (rep <- 1 to 2) {
      time(s"encode only rep$rep")(
        MultimodalOps.encodeWavMedia(docs).write.format("noop")
          .mode("overwrite").save())
      time(s"encode+decode rep$rep")(
        MultimodalOps.decodeAudio(MultimodalOps.encodeWavMedia(docs))
          .write.format("noop").mode("overwrite").save())
      time(s"encode+decode+orderBy rep$rep")(
        MultimodalOps.decodeAudio(MultimodalOps.encodeWavMedia(docs))
          .toDF().orderBy("media_id").write.format("noop")
          .mode("overwrite").save())
      time(s"enc+down+dec+orderBy rep$rep")(
        MultimodalOps.decodeAudio(MultimodalOps.downsampleWavMedia(
            MultimodalOps.encodeWavMedia(docs), 2))
          .toDF().orderBy("media_id").write.format("noop")
          .mode("overwrite").save())
    }
    spark.stop()
  }
}
