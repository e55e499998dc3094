package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Decade measurement for product quantization (runMain): at the
  * fixture in SPARK_GRAFT_SF_DIR, time the one-time encode pass
  * (corpus → code table) and the warm ADC top-k against the float
  * brute-force baseline, plus recall@10 of ADC vs exact. Run at sf0.1
  * (20k vectors) and MakeScale x10 (200k) to read each side's
  * per-decade factor: encode is the nightly index build (linear,
  * n·m·ksub subspace distances), ADC is the per-query-batch scan whose
  * point is moving codes (bytes) instead of vectors. */
object PqDecade {
  private val M = 8
  private val Ksub = 16
  private val Dim = 64

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
      println(f"[pq] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows rows)")
      rows
    }

    val corpus = {
      val c = SimilarityOps.normalizedCorpus(
        graft.Tables.embeddings(spark, dir)).cache()
      c.count(); c
    }
    val n = corpus.count()
    println(s"[pq] n=$n m=$M ksub=$Ksub")
    val qids = 0L to 9L

    val cb = {
      val c = SimilarityOps.pqCodebook(corpus, Dim, M, Ksub).cache()
      c.count(); c
    }
    val codes = SimilarityOps.pqCodes(corpus, cb, Dim, M).cache()
    time("encode (index build, cold)")(codes.count())

    time("adc top-k (rep1)") {
      SimilarityOps.pqAdcTopKCodes(codes, corpus, cb, Dim, M, Ksub, qids, 10).count()
    }
    time("adc top-k (warm rep2)") {
      SimilarityOps.pqAdcTopKCodes(codes, corpus, cb, Dim, M, Ksub, qids, 10).count()
    }
    time("brute float top-k (rep1)") {
      SimilarityOps.bruteForceTopKNorm(corpus, qids, 10).count()
    }
    time("brute float top-k (warm rep2)") {
      SimilarityOps.bruteForceTopKNorm(corpus, qids, 10).count()
    }

    time("adc+rerank top-k (shortlist 50)") {
      SimilarityOps.pqAdcRerankTopK(codes, corpus, cb, Dim, M, Ksub,
        qids, 10, 50).count()
    }

    val brute = SimilarityOps.bruteForceTopKNorm(corpus, qids, 10)
      .select(col("query_id"), col("neighbor_id"))
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val a = approx.select(col("query_id"), col("neighbor_id"),
        lit(1).as("hit"))
      brute.join(a, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("hit"))).collect()(0).getLong(0) / 100.0
    }
    println(f"[pq] adc recall@10 vs exact:    ${recall(
      SimilarityOps.pqAdcTopKCodes(codes, corpus, cb, Dim, M, Ksub, qids, 10))}%.2f")
    println(f"[pq] rerank recall@10 vs exact: ${recall(
      SimilarityOps.pqAdcRerankTopK(codes, corpus, cb, Dim, M, Ksub, qids, 10, 50))}%.2f")
    spark.stop()
  }
}
