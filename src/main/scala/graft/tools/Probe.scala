package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for plan/stage timing investigations (runMain).
  * Current question: the sf1 scaling run showed the blocked embedding
  * dedup super-linear at FIXED nCells=16 (Σ|cell|² ~ nprobe²·n²/nCells).
  * Measure how the nCells knob restores scaling at sf1 (20k vectors) —
  * the number SCALE.md's "nCells scales with the corpus" claim owes. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val corpus = graft.ops.SimilarityOps
      .normalizedCorpus(graft.Tables.embeddings(spark, dir)).cache()
    val n = corpus.count()
    println(s"[probe] corpus $dir n=$n")
    for (nCells <- Seq(16, 64, 128, 256)) {
      val t0 = System.nanoTime()
      val cents = graft.ops.SimilarityOps.ivfCentroidsNorm(corpus, nCells)
        .cache()
      cents.count()
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = graft.ops.SimilarityOps
        .cosineNearDupPairsBlockedNormWith(corpus, cents, 0.4, 2)
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      println(f"[probe] nCells=$nCells%4d train=$tTrain%6.2fs pairs=$tPairs%7.2fs found=$nPairs")
      cents.unpersist()
    }
    spark.stop()
  }
}
