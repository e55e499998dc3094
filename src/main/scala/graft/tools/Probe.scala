package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for plan/stage timing investigations (runMain).
  * Current question: where does `dedup_embedding_cosine` spend its time
  * at the 200k-vector decade fixture — centroid staging (Lloyd round),
  * cell assignment, candidate generation, or verification? Each stage is
  * timed with a count()/noop so the next stage's cost is isolated. */
object Probe {
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
      println(f"[probe] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    import graft.ops.SimilarityOps
    val corpus = time("normalize+cache corpus") {
      val c = SimilarityOps.normalizedCorpus(
        graft.Tables.embeddings(spark, dir)).cache()
      c.count(); c
    }
    val n = corpus.count()
    val nCells = SimilarityOps.autoCellCount(n)
    println(s"[probe] n=$n nCells=$nCells")
    val cents = time("centroids (Lloyd 1 round)") {
      val c = SimilarityOps.ivfCentroidsNorm(corpus, nCells).cache()
      c.count(); c
    }
    val assigned = time("multi-assign nprobe=2") {
      val a = SimilarityOps.ivfMultiAssignNormWith(corpus, cents, 2).cache()
      a.count(); a
    }
    val cands = time("candidate pairs (cell join + distinct)") {
      val c = assigned.as("a").join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct().cache()
      println(s"[probe] n_cands=${c.count()}")
      c
    }
    time("verify (attach + dot + filter)") {
      val v = cands
        .join(corpus.select(col("vec_id").as("vec_a"), col("n_emb").as("ea")), Seq("vec_a"))
        .join(corpus.select(col("vec_id").as("vec_b"), col("n_emb").as("eb")), Seq("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          SimilarityOps.dotCosine(col("ea"), col("eb")).as("cosine_sim"))
        .filter(col("cosine_sim") >= 0.4)
      println(s"[probe] n_pairs=${v.count()}")
    }
    spark.stop()
  }
}
