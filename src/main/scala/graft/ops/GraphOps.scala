package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics over relationships DERIVED from the event stream —
  * the co-occurrence-graph + iterative-ranking family (the dedup
  * connected-components op's directed, weighted sibling).
  *
  * Determinism: ranks are re-rounded to 9 dp every iteration, per-edge
  * contributions are rounded to 9 dp BEFORE the sum, sums run in
  * DECIMAL(30,9) (exact, order-free), and the damping multiply runs in
  * decimal space (0.85 × a 9-dp decimal is an exact 11-dp decimal whose
  * 9-dp round can land on a .5 boundary — double-space rounding there
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
    * Returns (node, rank) with ranks on the deterministic 9-dp grid.
    * (9, not 12: each engine rounds doubles its own way — Spark exact
    * BigDecimal HALF_UP, DuckDB via a 10^k multiply — and at 12 dp the
    * multiply's ~1.5e-5-unit representation error flipped the last
    * digit on 2 of 1550 sf0.1 nodes. At 9 dp the error margin is
    * ~1.5e-8 units, making a flip astronomically unlikely while the
    * grid still resolves centrality differences of 1e-9.)
    *
    * Convergence: because every rank lives on the 9-dp grid, the
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
    * `< iters` iff the 9-dp fixed point was reached early.
    *
    * CACHE LIFECYCLE: the returned frame is itself CACHED and
    * materialized (node-sized), and the cache is owned by the caller —
    * `unpersist()` on the RETURNED frame frees it (it is the cached
    * plan, not a projection over one — a projection would not
    * plan-match the cache entry and the documented contract couldn't
    * free anything). The final round's internal units cache is dropped
    * here, AFTER the published frame materializes from it. A caller
    * that invokes this repeatedly without unpersisting (e.g. bench
    * reps) accumulates one node-sized cached block per call until LRU
    * eviction — harmless for dimension-sized node sets, but a
    * long-lived service should unpersist explicitly.
    *
    * NODE-COUNT ENVELOPE: the fixed-point grid is DERIVED FROM n
    * ([[gridUnit]] — nanos, picos, or femtos), so the initial rank 1/n
    * and the teleport 0.15/n always land ≥ 1 unit half-up: nanos up to
    * 3·10^8 nodes, picos to 3·10^11, femtos to 3·10^14 (past that even
    * femtos floor the teleport to 0 — enforced with a named require,
    * not silent degradation; and 170·s in the damping step would
    * overflow BIGINT on a finer grid than femtos, so the ladder stops
    * there). The unit is a deterministic function of n that the oracle
    * re-derives in SQL, keeping the replay bit-exact at every rung.
    * Edge-weight bound scales inversely (2·rank_units·w must fit
    * BIGINT): w < 4.6·10^18/unit — 4.6·10^9 on nanos, 4.6·10^3 on
    * femtos — documented at the step formula. */
  def pagerankWithIters(edges: DataFrame, iters: Int): (DataFrame, Int) =
    pagerankWithIters(edges, iters, None)

  /** The fixed-point grid for an n-node graph: the coarsest of
    * nanos/picos/femtos on which teleport 0.15/n still rounds half-up
    * to ≥ 1 unit (0.15·u/n ≥ 0.5 ⟺ n ≤ 3·10^(d-1) for u = 10^d).
    * Coarsest-first keeps the edge-weight overflow headroom maximal. */
  def gridUnit(n: Long): Long = {
    require(n >= 1, s"need at least one node, got $n")
    require(n <= 300000000000000L,
      s"pagerank integer grid supports at most 3e14 nodes (got $n): " +
        "teleport 0.15/n floors to 0 femto-units past that, and a " +
        "finer grid would overflow 170*s in the damping step")
    if (n <= 300000000L) 1000000000L
    else if (n <= 300000000000L) 1000000000000L
    else 1000000000000000L
  }

  private[graft] def pagerankWithIters(edges: DataFrame, iters: Int,
      unitOverride: Option[Long]): (DataFrame, Int) = {
    val spark = edges.sparkSession
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val e = edges.join(outw, Seq("src"))
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .cache()
    val nodes = e.select(col("src").as("node")).distinct()
    val nLong = nodes.count()
    // INTEGER unit-grid iteration: every round is round-half-up on the
    // n-derived grid ([[gridUnit]]) expressed as pure BIGINT
    // arithmetic, (2a + b) div (2b) for a/b — bit-identical in ANY
    // engine. Float/decimal rounding is NOT portable here:
    // contributions rank·w/outw land EXACTLY on .5 grid boundaries
    // whenever outw's factors are all 2s and 5s (outw = 2 is every
    // two-interaction user), and there Spark's exact-BigDecimal
    // HALF_UP and DuckDB's multiply-by-10^k double round disagree
    // systematically (4 of 1505 sf0.1 nodes, all hubs). Integer
    // arithmetic has no such boundary: the half-up decision IS the
    // arithmetic. Overflow bound: 2·rank_units·w ≤ 2·unit·w fits
    // BIGINT for w < 4.6e18/unit (edge weights are per-pair
    // interaction counts).
    val unit = unitOverride.getOrElse(gridUnit(nLong))
    // the overflow bound, ENFORCED not just documented: the step term
    // 2·rank_units·w must fit BIGINT with rank_units up to ~unit (a hub
    // can briefly hold most of the mass), so cap w at Long.Max/(4·unit)
    // — 2× headroom over the worst case. On the nano grid that is
    // w ≤ 2.3e9; femtos, w ≤ 2.3e3. Silent wrap-around here would
    // corrupt ranks without failing the oracle comparison shape.
    val maxW = e.agg(max(col("w").cast("long"))).first().getLong(0)
    require(maxW <= Long.MaxValue / (4L * unit),
      s"max edge weight $maxW overflows the ${unit}-unit grid's step " +
        s"arithmetic (bound ${Long.MaxValue / (4L * unit)}): rescale " +
        "edge weights or shrink the node count to coarsen the grid")
    val initUnits = (2L * unit + nLong) / (2L * nLong)
    val teleportUnits = (3L * unit / 10L + nLong) / (2L * nLong)
    var r = nodes.select(col("node"),
      lit(initUnits).as("rank_units")).cache()
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val stepped = e.join(r, e("src") === r("node"))
        .select(col("dst"),
          expr("(2 * rank_units * w + outw) div (2 * outw)").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        // damping 0.85·s at 9 dp = round_half_up(85·s/100) =
        // (170·s + 100) div 200; teleport adds as exact units
        .select(col("dst").as("node"),
          (lit(teleportUnits) +
            expr("(170 * s + 100) div 200")).as("rank_units"))
      // lineage truncation: constant-size plan per round (see above)
      val next = spark.createDataFrame(stepped.rdd, stepped.schema).cache()
      // exact integer Σ|Δ| — zero ⟺ the nano-grid rank vector is a
      // fixed point (the join is node-keyed equality, dimension-sized
      // here, node-sharded at scale). This action also materializes
      // `next`. FULL OUTER, not inner: the symmetric-edge-list
      // precondition fixes the node set each round, but on an input
      // outside that contract (dangling nodes shrinking one side) an
      // inner join could drop the divergent rows and report a spurious
      // zero — a missing side coalesces to a value the other side
      // can't equal (ranks are positive), so node-set drift reads as
      // divergence and the loop runs its full budget instead of
      // stopping wrong.
      val deltaRow = next
        .join(r.withColumnRenamed("rank_units", "prev"), Seq("node"),
          "full_outer")
        .agg(sum(abs(coalesce(col("rank_units"), lit(-1L))
          - coalesce(col("prev"), lit(-1L)))))
        .first()
      converged = !deltaRow.isNullAt(0) && deltaRow.getLong(0) == 0L
      r.unpersist()
      r = next
      it += 1
    }
    e.unpersist()
    // publish on the unit grid: units/unit is one IEEE division (unit is
    // an exact power of ten, exactly representable as a double),
    // identical in both engines. The published projection is cached and
    // materialized HERE so (a) the caller's unpersist() plan-matches the
    // frame we hand out, and (b) the internal nanos cache can be dropped
    // now — materializing from it first avoids replaying any round.
    val published = r.select(col("node"),
      (col("rank_units").cast("double") / lit(unit.toDouble)).as("rank")).cache()
    published.count()
    r.unpersist()
    (published, it)
  }
}
