package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Decade measurement for INCREMENTAL index maintenance (runMain): at
  * the fixture in SPARK_GRAFT_SF_DIR, a FIXED 1000-vector batch
  * (vec_id < 1000) is appended to a two-level index trained on the
  * rest. The claim under test: per-batch append cost scales with the
  * BATCH (O(|batch|·(k1+k2)) + the (k1·k2)-row child join), not the
  * corpus — while the non-incremental alternative (retrain + reassign
  * everything) scales with the corpus. Run at MakeScale x10 (20k) and
  * x100 (200k) embedding fixtures and read the two growth rates side
  * by side.
  */
object AnnAppendDecade {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(tag: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[append] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows rows)")
      rows
    }

    val nc = SimilarityOps.normalizedCorpus(
      graft.Tables.embeddings(spark, dir)).cache()
    val batch = nc.filter(col("vec_id") < 1000).cache()
    val hist = nc.filter(col("vec_id") >= 1000).cache()
    val nHist = hist.count(); val nBatch = batch.count()
    val k = SimilarityOps.autoCellCount(nHist)
    val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(2, math.ceil(k.toDouble / k1).toInt)
    println(s"[append] nHist=$nHist nBatch=$nBatch k=$k k1=$k1 k2=$k2")

    // one-time index build over the historical corpus (amortized across
    // every subsequent daily batch — measured for the denominator story)
    val sc = SimilarityOps.ivfCentroidsNorm(hist, k1).cache()
    time("train super centroids (one-time)")(sc.count())
    val ch = SimilarityOps.ivf2Children(hist, sc, k2).cache()
    time("derive children (one-time)")(ch.count())
    val ex = SimilarityOps.ivf2AssignBatchNorm(hist, sc, ch).cache()
    time("assign historical corpus (one-time)")(ex.count())

    // the daily op: assign the arriving batch against the frozen index
    def append(): Long =
      SimilarityOps.ivf2AssignBatchNorm(batch, sc, ch).count()
    append()
    time("append batch assign (warm)")(append())
    time("append batch assign (warm rep2)")(append())

    // append + the occupancy watch (the registered maintenance pair)
    def watch(): Long = SimilarityOps.ivf2AppendStats(ex,
      SimilarityOps.ivf2AssignBatchNorm(batch, sc, ch), 1.5).count()
    watch()
    time("append + hot-cell watch (warm)")(watch())
    time("append + hot-cell watch (warm rep2)")(watch())

    // the non-incremental alternative: retrain the quantizer on the
    // full post-append corpus and reassign every vector
    def rebuild(): Long = {
      val sc2 = SimilarityOps.ivfCentroidsNorm(nc, k1)
      val ch2 = SimilarityOps.ivf2Children(nc, sc2, k2)
      SimilarityOps.ivf2AssignBatchNorm(nc, sc2, ch2).count()
    }
    rebuild()
    time("full retrain+reassign (warm)")(rebuild())
    time("full retrain+reassign (warm rep2)")(rebuild())
    spark.stop()
  }
}
