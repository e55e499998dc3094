package graft.tools

import graft.ops.{GraphAnnOps, SimilarityOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade measurement for the graph-ANN build's scale knob: the
  * IVF-cell-blocked build costs Σ_cells |cell|·|probed members| — with
  * a FIXED cell count that term is quadratic in n, with cells ∝ √n it
  * is n^1.5/√k per decade step and each cell stays bounded (the same
  * discipline as semdedup's maxCellSize and the two-level IVF family).
  * This tool builds the graph at a given cell count, times it, and
  * reports edge count + beam-search recall vs brute on the standard
  * query ids — so BASELINE.md can carry the measured fixed-k vs
  * scaled-k comparison instead of an argument.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  *     sbt "runMain graft.tools.GraphAnnDecade 16 448"
  */
object GraphAnnDecade {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val corpus = SimilarityOps.normalizedCorpus(
      graft.Tables.embeddings(spark, dir)).cache()
    val n = corpus.count()
    val queryIds: Seq[Long] = 0L to 9L
    val k = 10
    val brute = SimilarityOps.bruteForceTopKNorm(corpus, queryIds, k)
      .select(col("query_id"), col("neighbor_id")).cache()
    brute.count()
    args.map(_.toInt).foreach { nCells =>
      val t0 = System.nanoTime()
      val cents = SimilarityOps.ivfCentroidsNorm(corpus, nCells)
      val edges = GraphAnnOps.knnGraph(corpus, cents, m = 8, buildProbe = 2)
        .cache()
      val nEdges = edges.count()
      val buildS = (System.nanoTime() - t0) / 1e9
      // two search budgets: the registered constants, and a doubled
      // budget — the recovery lever when n grows at fixed beam/steps
      Seq((32, 4), (64, 8), (128, 12)).foreach { case (beam, steps) =>
        val t1 = System.nanoTime()
        val topk = GraphAnnOps.beamSearchTopK(corpus, edges, queryIds,
            beam = beam, steps = steps, k = k)
          .select(col("query_id"), col("neighbor_id"))
        val matched = brute.join(topk, Seq("query_id", "neighbor_id"),
          "left_semi").count()
        val searchS = (System.nanoTime() - t1) / 1e9
        println(f"[graphdecade] n=$n nCells=$nCells edges=$nEdges " +
          f"build=$buildS%.1f s beam=$beam steps=$steps " +
          f"search=$searchS%.1f s " +
          f"recall@$k=${matched.toDouble / (queryIds.size * k)}%.3f")
      }
      edges.unpersist()
    }
    spark.stop()
  }
}
