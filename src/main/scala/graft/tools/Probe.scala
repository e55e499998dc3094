package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for plan/stage timing investigations (runMain).
  * Current question: what does the `maxCellSize` hot-cell cap buy on a
  * skewed corpus at scale? 100k vectors, 90% exactly identical (the
  * worst-case dense near-dup cluster — one cell holds 90k vectors),
  * blocked pairing capped vs uncapped. The uncapped hot cell alone is
  * 90k²/2 ≈ 4·10⁹ candidate pairs; the cap bounds per-cell work at
  * cap² per sub-cell. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.ops.SimilarityOps

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val dim = 16
    val n = 100000L
    val corpus = time("build skewed corpus (90% identical)") {
      val c = SimilarityOps.normalizedCorpus(
        spark.range(n).map { i =>
          val v = Array.fill(dim)(0.0f)
          if (i % 10 != 0) v(0) = 1.0f
          else v((i / 10 % dim).toInt) = 1.0f
          (i, v.toSeq)
        }.toDF("vec_id", "embedding")).cache()
      c.count(); c
    }
    val cents = time("train centroids (k = 2 sqrt n)") {
      val c = SimilarityOps.ivfCentroidsNorm(
        corpus, SimilarityOps.autoCellCount(n)).cache()
      c.count(); c
    }
    // capped first (uncapped may be minutes — run it last, bounded reps)
    Seq(512L, 2048L).foreach { cap =>
      time(s"blocked pairs, cap=$cap") {
        println(s"[probe]   n_pairs=" + SimilarityOps
          .cosineNearDupPairsBlockedNormWith(corpus, cents, 0.9, 2, cap)
          .count())
      }
    }
    // The uncapped run is not timed: its hot cell alone is 90k²/2 ≈
    // 4·10⁹ surviving pairs (nprobe=2 doubles the join rows before
    // dedup) — a first attempt ran >9 minutes without completing, which
    // is the finding. Report the candidate-work histogram instead.
    val work = SimilarityOps.ivfMultiAssignNormWith(corpus, cents, 2)
      .groupBy("cell").count()
      .agg(sum(col("count") * col("count")).as("w"), max("count").as("top"))
      .collect()(0)
    println(s"[probe] UNCAPPED candidate work Σ|cell|² = ${work.getLong(0)}" +
      s" (top cell ${work.getLong(1)} rows) — not materialized")
    spark.stop()
  }
}
