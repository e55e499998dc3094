package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tiled block-matrix all-pairs cosine kernel.
  *
  * The declarative triangular self-join materializes both 64-float
  * vectors for every candidate pair before filtering — at n² pairs the
  * row materialization, not the arithmetic, dominates. This kernel keeps
  * the tight dot-product inner loop but runs it TILED: the corpus is
  * hashed into `nBlocks` blocks, every unordered block pair (i ≤ j)
  * becomes one tile, and each tile task buffers only ONE block
  * (n/nBlocks rows) while streaming the other — the GEMM-tile pattern
  * production similarity systems use. Nothing is ever collected to the
  * driver; total work is the same triangular n²/2, shuffle volume is
  * ~nBlocks× the corpus (the standard tile replication trade), and peak
  * task memory is one block, so the operator scales by raising nBlocks.
  *
  * Same fold order and 6-dp rounding as SimilarityOps.dotCosine, so the
  * result set is bit-identical to the declarative form and the shared
  * DuckDB oracle (spec-asserted).
  */
object SimilarityKernel {

  final case class TileVec(tile: Int, vec_id: Long, n_emb: Array[Double])
  final case class Pair(vec_a: Long, vec_b: Long, cosine_sim: Double)

  def cosineNearDupPairsKernel(embeddings: DataFrame, threshold: Double,
                               nBlocks: Int = 8): DataFrame =
    cosineNearDupPairsKernelNorm(
      SimilarityOps.normalizedCorpus(embeddings), threshold, nBlocks)

  /** Same, over an already-normalized (vec_id, n_emb) corpus. */
  def cosineNearDupPairsKernelNorm(normCorpus: DataFrame, threshold: Double,
                                   nBlocks: Int = 8): DataFrame = {
    val spark = normCorpus.sparkSession
    import spark.implicits._
    val corpus = normCorpus
      .withColumn("blk", pmod(col("vec_id"), lit(nBlocks)).cast("int"))

    // Side A of tile (i, j) is block i; side B is block j. A row in block
    // b is replicated to its row of tiles on each side; tile key = i*n+j.
    val sideA = corpus
      .select(col("vec_id"), col("n_emb"),
        explode(sequence(col("blk"), lit(nBlocks - 1))).as("j"),
        col("blk").as("i"))
      .select((col("i") * nBlocks + col("j")).as("tile"),
        col("vec_id"), col("n_emb"))
      .as[TileVec]
    val sideB = corpus
      .select(col("vec_id"), col("n_emb"),
        explode(sequence(lit(0), col("blk"))).as("i"),
        col("blk").as("j"))
      .select((col("i") * nBlocks + col("j")).as("tile"),
        col("vec_id"), col("n_emb"))
      .as[TileVec]

    val out = sideA.groupByKey(_.tile).cogroup(sideB.groupByKey(_.tile)) {
      (tile, as, bs) =>
        val diagonal = tile / nBlocks == tile % nBlocks
        val bv = bs.toArray.sortBy(_.vec_id) // ONE block buffered per task
        val ids = bv.map(_.vec_id)
        as.flatMap { a =>
          // diagonal tiles are a triangular self-block: only partners with
          // a larger vec_id; off-diagonal tiles pair disjoint blocks, so
          // scan all of B and order the emitted pair by vec_id
          val start =
            if (diagonal) {
              var lo = java.util.Arrays.binarySearch(ids, a.vec_id)
              if (lo < 0) lo = -lo - 1 else lo += 1
              lo
            } else 0
          Iterator.range(start, bv.length).flatMap { j =>
            val b = bv(j)
            var s = 0.0
            var i = 0
            val n = math.min(a.n_emb.length, b.n_emb.length)
            while (i < n) { s += a.n_emb(i) * b.n_emb(i); i += 1 }
            val sim = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
            // a == b is impossible here: diagonal tiles start past
            // a.vec_id via the binary search, off-diagonal tiles pair
            // blocks of different pmod residues
            if (sim >= threshold)
              Some(if (a.vec_id < b.vec_id) Pair(a.vec_id, b.vec_id, sim)
                   else Pair(b.vec_id, a.vec_id, sim))
            else None
          }
        }
    }
    out.toDF()
  }
}
