package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for plan/stage timing investigations (runMain).
  * (r14: used for the dupClusters per-round decomposition, the
  * streaming-floor durationMs breakdown, and the foreachBatch width
  * A/B — findings recorded in OPTIMIZATION_r14.md. Currently idle.) */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[probe] idle — see OPTIMIZATION_r14.md for recorded probes")
    spark.stop()
  }
}
