package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for plan/stage timing investigations (runMain). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $n ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    t("warmup tables") {
      Seq("lineitem", "embeddings").foreach(n =>
        graft.Tables.load(spark, dir, n).count()) }
    t("normCorpus stage+count") { graft.queries.Staged.normCorpus(spark, dir).count() }
    t("brute cold") {
      graft.SparkEntry.queries("ann_topk_brute")(spark, dir)
        .write.format("noop").mode("overwrite").save() }
    t("brute warm") {
      graft.SparkEntry.queries("ann_topk_brute")(spark, dir)
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
