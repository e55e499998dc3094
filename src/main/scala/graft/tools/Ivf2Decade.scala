package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.SimilarityOps

/** Decade measurement for the two-level IVF (runMain): at the fixture
  * in SPARK_GRAFT_SF_DIR, time flat-IVF top-k against two-level top-k
  * at MATCHED effective cell count (k* = autoCellCount(n)) and matched
  * probe fraction, warm (corpus cached, centroids pre-staged — the
  * production shape where the quantizer is trained once). Run at 20k
  * and 200k vectors (MakeScale x10 / x100 of sf0.1 embeddings) to read
  * the per-decade factor of each index side by side.
  */
object Ivf2Decade {
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
      println(f"[ivf2] $tag%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows rows)")
      rows
    }

    val corpus = {
      val c = SimilarityOps.normalizedCorpus(
        graft.Tables.embeddings(spark, dir)).cache()
      c.count(); c
    }
    val n = corpus.count()
    val k = SimilarityOps.autoCellCount(n)
    val k1 = math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    val k2 = math.max(2, math.ceil(k.toDouble / k1).toInt)
    println(s"[ivf2] n=$n kFlat=$k k1=$k1 k2=$k2 (effective ${k1 * k2})")
    val qids = (0L to 9L)

    // train both quantizers once, unmeasured-into-measured split
    val flatCents = time("train flat centroids") {
      val c = SimilarityOps.ivfCentroidsNorm(corpus, k).cache(); c.count()
    }
    val flatC = SimilarityOps.ivfCentroidsNorm(corpus, k)
    val superC = time("train super centroids (k1)") {
      val c = SimilarityOps.ivfCentroidsNorm(corpus, k1).cache(); c.count()
    }
    val superCents = SimilarityOps.ivfCentroidsNorm(corpus, k1)

    // warm both paths once, then measure
    def flat(): Long = SimilarityOps
      .ivfTopKNormWith(corpus, flatC, qids, 10, 4).count()
    def two(): Long = SimilarityOps
      .ivf2TopKNormWith(corpus, superCents, k2, qids, 10, 2, 4).count()
    flat(); two()
    time("flat IVF top-k (warm)")(flat())
    time("two-level IVF top-k (warm)")(two())
    time("flat IVF top-k (warm rep2)")(flat())
    time("two-level IVF top-k (warm rep2)")(two())

    // recall@10 vs exact brute at PRODUCTION params — wall-clock alone
    // can't justify the hierarchy; the recall trade must be on the table
    val brute = SimilarityOps.bruteForceTopKNorm(corpus, qids, 10)
      .select("query_id", "neighbor_id").cache()
    val nBrute = brute.count()
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hit = brute.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count()
      math.rint(hit.toDouble / nBrute * 1000) / 1000
    }
    println(s"[ivf2] recall@10 flat (nprobe 4/$k) = " + recall(
      SimilarityOps.ivfTopKNormWith(corpus, flatC, qids, 10, 4)))
    println(s"[ivf2] recall@10 two-level (2 supers, 4 cells) = " + recall(
      SimilarityOps.ivf2TopKNormWith(corpus, superCents, k2, qids, 10, 2, 4)))

    // blocked near-dup: same fused verify, flat vs two-level cells
    def dflat(): Long = SimilarityOps
      .cosineNearDupPairsBlockedNormWith(corpus, flatC, 0.4, 2).count()
    def dtwo(): Long = SimilarityOps
      .cosineNearDupPairsBlocked2NormWith(corpus, superCents, k2, 0.4, 2).count()
    dflat(); dtwo()
    time("flat blocked dedup (warm)")(dflat())
    time("two-level blocked dedup (warm)")(dtwo())
    time("flat blocked dedup (warm rep2)")(dflat())
    time("two-level blocked dedup (warm rep2)")(dtwo())
    val _ = (flatCents, superC)
    spark.stop()
  }
}
