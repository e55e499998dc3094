package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hybrid-retrieval guarantees the fusion family is shipped on:
  *
  *  - weighted RRF's dominance floor: with recall-derived weights
  *    satisfying WIvf/(60+K) > (WLsh+WPq)/61, fused top-K MEMBERSHIP is
  *    exactly the best index's (the weaker indexes only reorder within
  *    it) — the property that makes the fusion safe to ship where
  *    equal-weight RRF measurably lost to its own input;
  *  - exact rerank beats every input: nominating with all three indexes
  *    and ranking by the true cosine recovers the candidate-union
  *    ceiling, so its recall is ≥ each single index's and ≥ the
  *    rank-blend's.
  *
  * All paths are exercised through the registered queries, so these pin
  * the shipped operators, not lookalikes.
  */
class HybridRerankSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def topkSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) =>
        q -> rows.map(_.getLong(1)).toSet
      }

  private def meanRecall(name: String): Double = {
    val rows = SparkEntry.queries(name)(spark, sf)
      .select("recall_at_k").collect()
    rows.map(_.getDouble(0)).sum / rows.length
  }

  test("weighted RRF top-k membership equals the best index's (dominance floor)") {
    val ivf = topkSets("ann_topk_ivf")
    val rrf = topkSets("ann_topk_rrf")
    assert(rrf.keySet == ivf.keySet)
    rrf.foreach { case (q, ids) =>
      assert(ids == ivf(q),
        s"query $q: fused membership $ids != IVF ${ivf(q)} — " +
          "the dominance inequality no longer holds for these weights/K")
    }
  }

  test("exact rerank recall >= every single index and >= the rank blend") {
    val hybrid = meanRecall("ann_recall_hybrid_rerank")
    Seq("ann_recall_ivf", "ann_recall_lsh", "ann_recall_pq",
        "ann_recall_rrf").foreach { n =>
      val single = meanRecall(n)
      assert(hybrid >= single - 1e-9,
        s"hybrid rerank $hybrid < $n $single — stage 2 lost to an input")
    }
  }

  test("rerank ranks by the true cosine: agrees with brute force on shared candidates") {
    // every fused result that IS a true top-k neighbor must carry the
    // same exact rank ordering the brute-force baseline assigns within
    // the intersection — i.e. stage 2 really applied the true metric
    val brute = SparkEntry.queries("ann_topk_brute")(spark, sf)
      .select("query_id", "neighbor_id", "cosine_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fused = SparkEntry.queries("ann_topk_hybrid_rerank")(spark, sf)
      .select("query_id", "neighbor_id", "cosine_sim").collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach { sim =>
        assert(math.abs(sim - r.getDouble(2)) < 1e-9,
          s"$key: rerank cosine ${r.getDouble(2)} != brute $sim")
      }
    }
  }

  test("fused output is top-k bounded per query") {
    val perQuery = SparkEntry.queries("ann_topk_hybrid_rerank")(spark, sf)
      .groupBy("query_id").count().collect()
    perQuery.foreach(r => assert(r.getLong(1) <= 10,
      s"query ${r.getLong(0)} returned ${r.getLong(1)} > k rows"))
  }
}
