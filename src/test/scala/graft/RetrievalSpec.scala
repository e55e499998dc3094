package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 + sparse↔dense hybrid retrieval guarantees:
  *
  *  - the posting list is consistent (dl really is the doc's token
  *    count; one row per (doc, token));
  *  - idf behaves like an idf (positive, strictly decreasing in df);
  *  - rankings are well-formed (contiguous ranks, non-increasing
  *    scores, self-exclusion honored where promised);
  *  - fusion only surfaces candidates its inputs nominated;
  *  - the integer-scaled exact cosine agrees with the naive metric;
  *  - the shipped claim: on the fixture, hybrid MRR ≥ each single
  *    retriever (the anti-dilution bar the round-7 RRF family missed).
  *
  * All through the registered queries — these pin the shipped
  * operators, not lookalikes.
  */
class RetrievalSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("posting list: one row per (doc, token), dl = Σ tf = token count") {
    val posts = ops.RetrievalOps.bm25Postings(Tables.documents(spark, sf))
    val dupes = posts.groupBy("doc_id", "token").count()
      .filter(col("count") > 1).count()
    assert(dupes == 0)
    val bad = posts.groupBy("doc_id")
      .agg(sum("tf").as("t"), max("dl").as("dmax"), min("dl").as("dmin"))
      .filter(col("t") =!= col("dmax") || col("t") =!= col("dmin"))
      .count()
    assert(bad == 0)
    // dl equals the raw whitespace token count for a sample doc
    val doc0Tokens = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0)
      .select(size(ops.TextOps.tokens(col("text")))).head().getInt(0)
    val dl0 = posts.filter(col("doc_id") === 0)
      .select("dl").head().getLong(0)
    assert(dl0 == doc0Tokens.toLong)
  }

  test("idf is positive and strictly decreasing in df") {
    val posts = ops.RetrievalOps.bm25Postings(Tables.documents(spark, sf))
    val idf = ops.RetrievalOps
      .bm25Idf(posts, ops.RetrievalOps.bm25Stats(posts))
      .select("df", "idf").distinct().collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(idf.forall(_._2 > 0.0))
    val byDf = idf.groupBy(_._1).map { case (d, vs) => d -> vs.head._2 }
      .toSeq.sortBy(_._1)
    byDf.sliding(2).foreach {
      case Seq((_, hi), (_, lo)) => assert(hi > lo)
      case _ =>
    }
  }

  private def wellFormed(name: String, scoreCol: String,
                         selfExcluded: Boolean): Unit = {
    val rows = SparkEntry.queries(name)(spark, sf)
      .select(col("query_id"), col("neighbor_id"),
        col(scoreCol).as("s"), col("rank"))
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      sorted.map(_.getDouble(2)).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b)
        case _ =>
      }
      if (selfExcluded) assert(!rs.exists(_.getLong(1) == q))
    }
  }

  test("bm25_topk: contiguous ranks, non-increasing scores, no self") {
    wellFormed("bm25_topk", "score", selfExcluded = true)
  }

  test("snippet rankings are well-formed; snippet BM25 may keep self") {
    wellFormed("snippet_bm25_topk", "score", selfExcluded = false)
    wellFormed("snippet_dense_topk", "cosine_sim", selfExcluded = false)
    wellFormed("snippet_topk_hybrid", "fused_score", selfExcluded = false)
  }

  test("hybrid fusion only surfaces candidates its inputs nominated") {
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sf)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val union = pairs("snippet_bm25_topk") ++ pairs("snippet_dense_topk")
    assert(pairs("snippet_topk_hybrid").subsetOf(union))
  }

  test("integer-scaled exact cosine agrees with the naive metric") {
    val emb = queriesPkgCorpus()
    val naive = emb.select(
      ops.SimilarityOps.dotCosine(col("a"), col("b")).as("c1"),
      ops.RetrievalOps.intScaledCosine(col("a"), col("b")).as("c2"))
      .collect()
    naive.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 2e-6)
    }
  }

  /** A few corpus-embedding pairs (a, b) for the cosine-agreement
    * check. */
  private def queriesPkgCorpus() = {
    val e = ops.SimilarityOps
      .hashEmbed(Tables.documents(spark, sf).limit(40), 16)
      .filter(col("n_emb").isNotNull)
    e.select(col("vec_id").as("ia"), col("n_emb").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("n_emb").as("b")))
      .filter(col("ia") < col("ib")).limit(200)
  }

  test("incremental df update equals a from-scratch rebuild") {
    // the claim that makes bm25_index_append an INDEX MAINTENANCE op:
    // base-index df + batch delta must equal the df a full rebuild
    // over (base ∪ batch) would compute, for every affected token
    val appended = SparkEntry.queries("bm25_index_append")(spark, sf)
      .select("token", "df_after").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = ops.RetrievalOps.bm25Postings(Tables.documents(spark, sf))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(appended.nonEmpty)
    appended.foreach { case (tok, dfAfter) =>
      assert(full(tok) == dfAfter,
        s"token '$tok': incremental $dfAfter vs rebuild ${full(tok)}")
    }
  }

  test("typo correction recovers the dropped-character original") {
    val corr = SparkEntry.queries("bm25_typo_corrections")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getString(2), r.getInt(3))).toMap
    assert(corr.nonEmpty)
    // every winner is within the declared distance cap
    assert(corr.values.forall(_._2 <= 2))
    // originals: the distinct snippet terms per query doc
    val orig = Tables.documents(spark, sf)
      .filter(col("doc_id").isInCollection(0L to 29L))
      .select(col("doc_id"), explode(array_distinct(
        slice(ops.TextOps.tokens(col("text")), 1, 8))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corrupted = orig.filter(_._2.length >= 4)
    val recovered = corrupted.count { case (q, t) =>
      corr.get((q, t.dropRight(1))).exists(_._1 == t)
    }
    // the original is always a distance-1 same-block candidate, so a
    // miss needs a dist-0 vocab collision or a lex-smaller dist-1 tie
    assert(recovered.toDouble / corrupted.length >= 0.6,
      s"recovered only $recovered/${corrupted.length}")
  }

  test("contrastive triples: labels honored, margin consistent") {
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = SparkEntry.queries("contrastive_triples")(spark, sf)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val anchor = r.getAs[Long]("anchor_id")
      assert(labels(r.getAs[Long]("pos_id")) == labels(anchor))
      assert(labels(r.getAs[Long]("neg_id")) != labels(anchor))
      val m = BigDecimal(r.getAs[Double]("pos_sim") -
        r.getAs[Double]("neg_sim"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(m - r.getAs[Double]("margin")) < 1e-9)
    }
  }

  test("typo eval: subword ≥ corrected ≥ raw (fixture claim)") {
    val rows = SparkEntry.queries("typo_retrieval_eval")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows.keySet ==
      Set("bm25_raw_typo", "bm25_corrected", "colbert_subword"))
    assert(rows("bm25_corrected") >= rows("bm25_raw_typo"))
    assert(rows("colbert_subword") >= rows("bm25_corrected"))
  }

  test("fixture claim: hybrid MRR ≥ each single retriever, 30 queries") {
    val rows = SparkEntry.queries("snippet_retrieval_eval")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("bm25", "dense", "hybrid_rrf"))
    assert(rows.values.forall(_._1 == 30L))
    val mrr = rows.map { case (k, v) => k -> v._3 }
    assert(mrr("hybrid_rrf") >= mrr("bm25"))
    assert(mrr("hybrid_rrf") >= mrr("dense"))
  }
}
