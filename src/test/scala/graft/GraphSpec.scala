package graft

import graft.ops.GraphOps
import org.scalatest.funsuite.AnyFunSuite

/** PageRank invariants on a known graph: probability-mass conservation
  * (Σ ranks ≈ 1 — teleport + damped redistribution is stochastic),
  * order correctness on an asymmetric-degree graph, and the edge
  * builders' symmetry contracts.
  */
class GraphSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val events = Seq(
    (1L, "hub"), (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "hub"), (2L, "a"),
    (3L, "hub"), (3L, "b"),
    (4L, "hub")
  ).toDF("trader_id", "symbol")

  test("bipartite edges are symmetric with conserved weight") {
    val e = GraphOps.bipartiteEdges(events, "trader_id", "symbol").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(e.length % 2 == 0)
    e.foreach { case (s, d, w) =>
      assert(e.contains((d, s, w)), s"missing reverse edge for ($s,$d)")
    }
    assert(e.map(_._3).sum == 2 * events.count())
  }

  test("pagerank conserves probability mass and ranks the hub first") {
    val r = GraphOps.pagerank(
      GraphOps.bipartiteEdges(events, "trader_id", "symbol"), 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val mass = r.values.sum
    // per-node 9-dp rounding drifts mass by at most nodes × 5e-10
    assert(math.abs(mass - 1.0) < 1e-7, s"mass $mass")
    // 'hub' is touched by all four users — it must outrank every
    // other symbol (u:1 touches 4 symbols and ties hub exactly by
    // symmetry, so users are compared with ≥)
    val hub = r("k:hub")
    r.filter(k => k._1.startsWith("k:") && k._1 != "k:hub").foreach {
      case (n, v) => assert(hub > v, s"hub ($hub) should outrank $n ($v)")
    }
    r.filter(_._1.startsWith("u:")).foreach { case (n, v) =>
      assert(hub >= v, s"hub ($hub) should not be below $n ($v)")
    }
  }

  test("pagerank stops early at the 9-dp fixed point with unchanged ranks") {
    // a symmetric 2-clique: both nodes hold rank 0.5 from the first
    // step on, so the exact-decimal Σ|Δ| hits zero immediately and the
    // loop must stop long before the cap — with ranks bit-identical to
    // running the full count (a fixed point makes later steps identity)
    val twoClique = Seq(("x", "y", 1L), ("y", "x", 1L))
      .toDF("src", "dst", "w")
    val (r2, it) = GraphOps.pagerankWithIters(twoClique, 10)
    assert(it < 10, s"expected early stop, ran $it iterations")
    val ranks = r2.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(ranks("x") == 0.5 && ranks("y") == 0.5, s"ranks $ranks")
    // the full-count run lands on the identical vector
    val rFull = GraphOps.pagerank(twoClique, 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(rFull == ranks)
  }

  test("pagerank cache contract: unpersisting the returned frame frees it") {
    // the documented lifecycle: the caller owns one cached node-sized
    // block per call and unpersist() on the RETURNED frame must
    // plan-match the cache entry (a projection over the cache wouldn't)
    val twoClique = Seq(("x", "y", 1L), ("y", "x", 1L))
      .toDF("src", "dst", "w")
    val (r, _) = GraphOps.pagerankWithIters(twoClique, 3)
    assert(r.storageLevel.useMemory, "returned frame should be cached")
    r.unpersist()
    assert(!r.storageLevel.useMemory,
      "unpersist on the returned frame must free the cache entry")
  }

  test("pagerank grid unit derives from n: nanos, picos, femtos; stop at 3e14") {
    // the synthetic large-n law (building 3e8+ real nodes is not a unit
    // test): the teleport term 0.15/n must land >= 1 unit half-up at
    // every rung, and each handover happens exactly where the coarser
    // grid would floor it to 0
    def teleport(n: Long, u: Long) = (3L * u / 10L + n) / (2L * n)
    assert(GraphOps.gridUnit(1L) == 1000000000L)
    assert(GraphOps.gridUnit(300000000L) == 1000000000L)
    assert(teleport(300000000L, 1000000000L) >= 1L)
    assert(teleport(300000001L, 1000000000L) == 0L,
      "3e8+1 nodes floors the nano teleport — nanos must hand over")
    assert(GraphOps.gridUnit(300000001L) == 1000000000000L)
    assert(teleport(300000001L, 1000000000000L) >= 1L)
    assert(GraphOps.gridUnit(300000000000L) == 1000000000000L)
    assert(teleport(300000000001L, 1000000000000L) == 0L,
      "3e11+1 nodes floors the pico teleport — picos must hand over")
    assert(GraphOps.gridUnit(300000000001L) == 1000000000000000L)
    assert(GraphOps.gridUnit(300000000000000L) == 1000000000000000L)
    assert(teleport(300000000000000L, 1000000000000000L) >= 1L)
    // past 3e14 even femtos floor to 0 (and a finer grid would
    // overflow 170·s) — named refusal, not silent degradation
    assert(teleport(300000000000001L, 1000000000000000L) == 0L)
    intercept[IllegalArgumentException](
      GraphOps.gridUnit(300000000000001L))
    intercept[IllegalArgumentException](GraphOps.gridUnit(0L))
  }

  test("pagerank rejects edge weights that would overflow the grid step") {
    // the femto grid caps w at Long.Max/(4e15) ≈ 2305; a weight of 1e6
    // would silently wrap 2·rank_units·w — the guard names it instead
    val heavy = Seq(("x", "y", 1000000L), ("y", "x", 1000000L))
      .toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException] {
      GraphOps.pagerankWithIters(heavy, 2, Some(1000000000000000L))
    }
    assert(ex.getMessage.contains("overflows"), ex.getMessage)
    // the same weights are fine on the natural (nano) grid
    val (ok, _) = GraphOps.pagerankWithIters(heavy, 2, None)
    assert(ok.count() == 2)
  }

  test("pagerank on a forced finer grid agrees with the natural grid") {
    // the rung-handover consistency law: the SAME small graph iterated
    // on the pico grid (what a >3e8-node graph would use) lands within
    // one nano of the nano-grid ranks — the grid changes resolution,
    // never the fixed point being approximated
    val edges = GraphOps.bipartiteEdges(events, "trader_id", "symbol")
    val nano = GraphOps.pagerank(edges, 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val (picoDf, _) = GraphOps.pagerankWithIters(edges, 10,
      Some(1000000000000L))
    val pico = picoDf
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(pico.keySet == nano.keySet)
    nano.foreach { case (n, v) =>
      assert(math.abs(pico(n) - v) <= 1e-8,
        s"$n: pico ${pico(n)} vs nano $v")
    }
    assert(math.abs(pico.values.sum - 1.0) < 1e-9)
  }

  test("co-occurrence edges exclude self-pairs and count shared actors") {
    val e = GraphOps.coOccurrenceEdges(events, "trader_id", "symbol")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(!e.keys.exists(k => k._1 == k._2))
    // hub co-occurs with 'a' for users 1 and 2
    assert(e(("hub", "a")) == 2L)
    assert(e(("a", "hub")) == 2L)
    // a and c share only user 1
    assert(e(("a", "c")) == 1L)
  }
}
