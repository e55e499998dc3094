package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics over relationships DERIVED from the event stream —
  * the co-occurrence-graph + iterative-ranking family (the dedup
  * connected-components op's directed, weighted sibling).
  *
  * Determinism: ranks are re-rounded to 12 dp every iteration, per-edge
  * contributions are rounded to 12 dp BEFORE the sum, sums run in
  * DECIMAL(30,12) (exact, order-free), and the damping multiply runs in
  * decimal space (0.85 × a 12-dp decimal is an exact 14-dp decimal whose
  * 12-dp round can land on a .5 boundary — double-space rounding there
  * would diverge between engines; decimal-space HALF_UP cannot). Both
  * engines therefore iterate the IDENTICAL rational sequence.
  *
  * Scale shape: the edge list is (user, symbol)-distinct self-joined on
  * the user key — sharded by user, never all-pairs across users; the
  * rank iteration is a constant number of (edges ⋈ ranks → groupBy dst)
  * rounds, each one equality-join + one bounded aggregate. Driver state
  * is the loop counter. On a billion-node graph the same plan runs
  * sharded by node key (this is exactly Pregel-as-joins); here nodes =
  * symbols, so every intermediate is dimension-sized.
  */
object GraphOps {

  /** Weighted co-occurrence edges: (src, dst, w) where w = number of
    * distinct `actor`s touching BOTH keys, src ≠ dst (both directions
    * present — the graph is symmetric by construction). The self-join
    * is keyed on the actor, so work is Σ_actor deg(actor)² — bounded by
    * the per-actor key breadth, never |keys|². */
  def coOccurrenceEdges(df: DataFrame, actor: String,
                        key: String): DataFrame = {
    val pairs = df.select(col(actor).as("a"), col(key).as("k")).distinct()
    val left = pairs.select(col("a"), col("k").as("src"))
    val right = pairs.select(col("a"), col("k").as("dst"))
    left.join(right, Seq("a"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Bipartite interaction edges: "u:<actor>" ↔ "k:<key>" with
    * w = interaction count, both directions (symmetric). One hash-agg
    * over the stream; edge count = |distinct (actor, key)| · 2. */
  def bipartiteEdges(df: DataFrame, actor: String, key: String): DataFrame = {
    val base = df
      .select(concat(lit("u:"), col(actor).cast("string")).as("src"),
        concat(lit("k:"), col(key).cast("string")).as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    base.unionByName(
      base.select(col("dst").as("src"), col("src").as("dst"), col("w")))
  }

  /** Weighted PageRank over an (src, dst, w) edge list, damping
    * d = 0.85, up to `iters` iterations with FIXED-POINT early stop.
    * Nodes are the edge endpoints (a symmetric edge list has no
    * dangling nodes — every node with out-edges has in-edges).
    * Returns (node, rank) with ranks on the deterministic 12-dp grid.
    *
    * Convergence: because every rank lives on the 12-dp grid, the
    * iteration can land EXACTLY on a fixed point — and once the rank
    * vector is unchanged, every further iteration is the identity, so
    * stopping early returns bit-identical ranks to running the full
    * `iters` (an oracle replaying the fixed count still hash-matches).
    * The signal is Σ|Δrank| summed in exact decimal (order-free, no
    * float tolerance), computed by the same node-keyed equality join
    * the step itself runs; the delta agg is the one action per round
    * and also materializes that round's cache.
    *
    * Lineage is TRUNCATED every round (the materialized round wrapped
    * back as a LogicalRDD): without it each round's logical plan nests
    * the previous one, and by round 10 every action — and every later
    * read of the final cache — pays multi-second replanning over the
    * whole chain (measured 5 s per cached read, 41 s for the loop, vs
    * 0.1 s / 4 s truncated). The RDD boundary keeps fault-recovery
    * lineage at the RDD layer (the iterative-algorithm convention
    * GraphX/MLlib use) and costs one row-conversion pass per round on
    * the node-sized table. */
  def pagerank(edges: DataFrame, iters: Int): DataFrame =
    pagerankWithIters(edges, iters)._1

  /** [[pagerank]] plus the number of iterations actually executed —
    * `< iters` iff the 12-dp fixed point was reached early.
    *
    * CACHE LIFECYCLE: the returned frame is the final round's CACHED
    * node-sized table, and the cache is owned by the caller —
    * `unpersist()` it when done. It cannot be dropped here: the round
    * caches are what break the per-round RDD recomputation chain, so
    * unpersisting before return would make every downstream action
    * replay all `iters` rounds. A caller that invokes this repeatedly
    * without unpersisting (e.g. bench reps) accumulates one node-sized
    * cached block per call until LRU eviction — harmless for
    * dimension-sized node sets, but a long-lived service should
    * unpersist explicitly. */
  def pagerankWithIters(edges: DataFrame, iters: Int): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val e = edges.join(outw, Seq("src"))
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .cache()
    val nodes = e.select(col("src").as("node")).distinct()
    val n = nodes.count().toDouble
    // both the init and teleport constants are computed by the SAME
    // round-a-double-to-12dp primitive the oracle uses, not a driver
    // BigDecimal with different rounding provenance
    val init = round(lit(1.0) / lit(n), 12)
    val teleport = round(lit(0.15) / lit(n), 12).cast(DecimalType(30, 12))
    val dDec = lit(new java.math.BigDecimal("0.85"))
    var r = nodes.select(col("node"), init.cast("double").as("rank")).cache()
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val stepped = e.join(r, e("src") === r("node"))
        .select(col("dst"),
          round(col("rank") * col("w") / col("outw"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(30, 12))).as("s"))
        // the sum narrows to DECIMAL(20,12) before the damping multiply:
        // at Spark's default widths 0.85 × a 38-precision decimal would
        // overflow 38 and silently REDUCE scale (to 11), diverging from
        // the oracle's exact 14-dp product; 20+2+1 = 23 never adjusts
        .select(col("dst").as("node"),
          round(teleport +
            round(dDec * col("s").cast(DecimalType(20, 12)), 12), 12)
            .cast("double").as("rank"))
      // lineage truncation: constant-size plan per round (see above)
      val next = spark.createDataFrame(stepped.rdd, stepped.schema).cache()
      // exact decimal Σ|Δ| — zero ⟺ the 12-dp rank vector is a fixed
      // point (the join is node-keyed equality, dimension-sized here,
      // node-sharded at scale). This action also materializes `next`.
      // FULL OUTER, not inner: the symmetric-edge-list precondition
      // fixes the node set each round, but on an input outside that
      // contract (dangling nodes shrinking one side) an inner join
      // could drop the divergent rows and report a spurious zero —
      // a missing side coalesces to a rank the other side can't equal
      // (ranks are positive), so node-set drift reads as divergence
      // and the loop runs its full budget instead of stopping wrong.
      val delta = next
        .join(r.withColumnRenamed("rank", "prev"), Seq("node"), "full_outer")
        .agg(sum(abs(coalesce(col("rank"), lit(-1.0)).cast(DecimalType(30, 12))
          - coalesce(col("prev"), lit(-1.0)).cast(DecimalType(30, 12)))))
        .first().getDecimal(0)
      converged = delta != null && delta.signum == 0
      r.unpersist()
      r = next
      it += 1
    }
    e.unpersist()
    (r, it)
  }
}
