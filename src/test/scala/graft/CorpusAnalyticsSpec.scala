package graft

import graft.ops.{CorpusOps, DedupOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the corpus-prep and financial-path operators
  * added in round 3 (value-vs-DuckDB is the driver's gate; these pin the
  * operator meanings on planted inputs and bound properties).
  */
class CorpusAnalyticsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("decontaminate: verbatim benchmark copy scores 1.0, disjoint doc 0.0") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // benchmark
      (1L, "alpha beta gamma delta epsilon zeta"), // verbatim copy
      (2L, "one two three four five six seven"),   // disjoint vocab
      (3L, "x alpha beta gamma y z w")             // partial overlap
    ).toDF("doc_id", "text")
    val index = DedupOps.docShingleHashes(docs, 3)
    val sizes = docs.select(col("doc_id"),
      size(graft.ops.TextOps.tokens(col("text"))).cast("long").minus(2)
        .as("n_sh"))
    val out = CorpusOps.decontaminate(index, sizes, col("doc_id") === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(!out.contains(0L), "benchmark docs must not be scored")
    assert(out(1L) == 1.0, "verbatim copy must be fully contaminated")
    assert(out(2L) == 0.0, "disjoint doc must score zero")
    assert(out(3L) > 0.0 && out(3L) < 1.0, "partial overlap in (0,1)")
  }

  test("chunkSpans: spans tile each shard exactly, chunk count = ceil(total/L)") {
    val spans = CorpusOps.chunkSpans(
      Tables.documents(spark, sf), 64L).cache()
    // spans are well-formed per doc
    assert(spans.filter(col("end_chunk") < col("start_chunk")).isEmpty)
    assert(spans.filter(
      col("n_chunks") =!= col("end_chunk") - col("start_chunk") + 1).isEmpty)
    // per shard: the highest end_chunk is ceil(total_tokens / L) - 1 and
    // consecutive docs are contiguous (no token gap between spans)
    val shard = spans.groupBy("lang", "source")
      .agg(sum("n_tokens").as("total"), max("end_chunk").as("last_chunk"))
    assert(shard.filter(
      col("last_chunk") =!= (col("total") - 1).divide(64).cast("long")).isEmpty)
    spans.unpersist()
  }

  test("chunkSpans property: random corpora tile correctly at chunk boundaries") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val L = 8L
    val gen = Gen.listOfN(40, for {
      shard <- Gen.oneOf("s0", "s1", "s2")
      // token counts hugging the chunk boundary: 1, L-1, L, L+1, 2L, ...
      n <- Gen.oneOf(1L, 7L, 8L, 9L, 16L, 3L, 20L)
    } yield (shard, n))
    val docs = gen.apply(Gen.Parameters.default, Seed(42L)).get
      .zipWithIndex.map { case ((shard, n), i) =>
        (i.toLong, "en", shard, Seq.fill(n.toInt)("w").mkString(" "))
      }.toDF("doc_id", "lang", "source", "text")
    val spans = CorpusOps.chunkSpans(docs, L)
      .orderBy("source", "doc_id").collect()
    spans.groupBy(_.getString(2)).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_.getLong(0)).foreach { r =>
        val (n, start, end) = (r.getLong(3), r.getLong(4), r.getLong(5))
        assert(start == cum / L, s"doc ${r.getLong(0)}: start chunk")
        assert(end == (cum + n - 1) / L, s"doc ${r.getLong(0)}: end chunk")
        cum += n
      }
    }
  }

  test("bigramProfile: fully repeated doc → one distinct bigram, frac 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam"),
      (2L, "all distinct words here now"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val p = CorpusOps.bigramProfile(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(p(1L) == ((4L, 1L, 1.0, 0.25)), "spam^5 = 4 bigrams, all equal")
    assert(p(2L)._2 == 4L && p(2L)._4 == 1.0, "distinct doc has ratio 1.0")
    assert(!p.contains(3L), "single-token doc has no bigram")
  }

  test("containment flags a doc pasted inside a larger one; Jaccard misses it") {
    import spark.implicits._
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + Seq.fill(40)("filler word soup here").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "unrelated text entirely here"))
      .toDF("doc_id", "text")
    val index = DedupOps.docShingleHashes(docs, 3)
    val sizes = docs.select(col("doc_id"),
      size(DedupOps.fastShingles(docs, 3, "text")).cast("long").as("n_sh"))
    val cont = DedupOps.containmentPairs(index, sizes, 0.8).collect()
    assert(cont.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getDouble(2) == 1.0), "short doc fully contained in long one")
    // the same pair is invisible to the symmetric Jaccard screen
    val jac = DedupOps.ngramJaccardPairsFromIndex(index, sizes, 0.5).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "Jaccard dilutes the contained pair below threshold")
  }

  test("forward as-of takes the NEXT tick, backward the previous") {
    import spark.implicits._
    val ticks = Seq(
      ("A", java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1.0),
      ("A", java.sql.Timestamp.valueOf("2024-01-01 00:01:30"), 2.0)
    ).toDF("symbol", "event_ts", "price")
    val probes = Seq(
      ("A", java.sql.Timestamp.valueOf("2024-01-01 00:01:00")))
      .toDF("symbol", "event_ts")
    val fwd = graft.ops.AsOfOps
      .asofJoinForward(ticks, probes, "symbol", "event_ts", "price")
      .collect()
    assert(fwd.length == 1 && fwd.head.getDouble(2) == 2.0,
      "forward picks the 00:01:30 tick")
    val bwd = graft.ops.AsOfOps
      .asofJoin(ticks, probes, "symbol", "event_ts", "price").collect()
    assert(bwd.length == 1 && bwd.head.getDouble(2) == 1.0,
      "backward picks the 00:00:10 tick")
    // tie visibility: a tick exactly at the probe instant matches BOTH
    val tied = Seq(
      ("A", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 9.0))
      .toDF("symbol", "event_ts", "price")
    assert(graft.ops.AsOfOps.asofJoinForward(tied, probes,
      "symbol", "event_ts", "price").collect().head.getDouble(2) == 9.0)
    assert(graft.ops.AsOfOps.asofJoin(tied, probes,
      "symbol", "event_ts", "price").collect().head.getDouble(2) == 9.0)
  }

  test("temperature mix: tail languages gain share, head languages lose it") {
    import org.apache.spark.sql.functions._
    val raw = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sel = SparkEntry.queries("corpus_temperature_mix")(spark, sf)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nRaw = raw.values.sum.toDouble
    val nSel = sel.values.sum.toDouble
    // total ≈ N/2 up to one floor per language
    assert(math.abs(nSel - nRaw / 2) <= raw.size,
      s"selected $nSel of $nRaw — target was N/2")
    // α = 0.5 compresses shares toward uniform: the rarest language's
    // selected share must rise vs its raw share, the commonest's fall
    val tail = raw.minBy(_._2)._1
    val head = raw.maxBy(_._2)._1
    assert(raw(tail) < raw(head), "fixture langs are uniform — test vacuous")
    assert(sel(tail) / nSel > raw(tail) / nRaw,
      s"tail lang $tail share did not increase")
    assert(sel(head) / nSel < raw(head) / nRaw,
      s"head lang $head share did not decrease")
    // each language's fill is the exact prefix of its hash ranking
    val byRank = SparkEntry.queries("corpus_temperature_mix")(spark, sf)
      .groupBy("lang").agg(max("samp_rank").as("mx"), count(lit(1)).as("n"))
      .collect()
    byRank.foreach(r => assert(r.getAs[Long]("mx") == r.getAs[Long]("n"),
      s"${r.getString(0)}: ranks are not a dense prefix"))
  }

  test("corpus_split is a deterministic 100-bucket hash partition of docs") {
    val out1 = SparkEntry.queries("corpus_split")(spark, sf).collect()
    val out2 = SparkEntry.queries("corpus_split")(spark, sf).collect()
    assert(out1.sameElements(out2), "split must be reproducible")
    val total = out1.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sf).count(),
      "every doc lands in exactly one split")
    val bySplit = out1.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit("train") > bySplit("val") + bySplit("test"),
      "train split must dominate (90/5/5 target)")
  }

  test("financial paths: rsi in [0,100], drawdown <= 0, twap within day range") {
    val rsi = SparkEntry.queries("rsi_14")(spark, sf)
      .agg(min("rsi_14"), max("rsi_14")).collect().head
    assert(rsi.getDouble(0) >= 0.0 && rsi.getDouble(1) <= 100.0)

    val dd = SparkEntry.queries("max_drawdown")(spark, sf).collect()
    assert(dd.nonEmpty && dd.forall(_.getDouble(2) <= 0.0))

    // twap must sit inside each (symbol, day)'s [min, max] price
    val t = graft.ops.TickOps.normalizeEvents(Tables.events(spark, sf))
      .filter(col("price").isNotNull)
      .withColumn("trade_date", to_date(col("event_ts")))
      .groupBy("symbol", "trade_date")
      .agg(min("price").as("lo"), max("price").as("hi"))
    val joined = SparkEntry.queries("twap_daily")(spark, sf)
      .join(t, Seq("symbol", "trade_date"))
    assert(joined.filter(col("twap").isNotNull &&
      (col("twap") < col("lo") || col("twap") > col("hi"))).isEmpty)
  }

  test("ann_recall_ivf: one row per query, recall in [0,1], probing can't overshoot") {
    val rows = SparkEntry.queries("ann_recall_ivf")(spark, sf).collect()
    assert(rows.length == 10, "one recall row per query id")
    rows.foreach { r =>
      val (n, rec) = (r.getLong(1), r.getDouble(2))
      assert(n >= 0 && n <= 10, s"matched count $n outside [0,10]")
      assert(rec >= 0.0 && rec <= 1.0 && rec == n / 10.0)
    }
    graft.queries.Staged.clearSession(spark)
  }

  test("cum_return starts at zero and rolling_volume_range includes self") {
    val first = SparkEntry.queries("cum_return")(spark, sf)
      .filter(col("cum_return") =!= 0.0)
      .groupBy("symbol").agg(count(lit(1)))
    // every symbol's first tick has return exactly 0 — so the count of
    // nonzero returns is strictly less than the tick count per symbol
    val ticks = graft.ops.TickOps.normalizeEvents(Tables.events(spark, sf))
      .filter(col("price").isNotNull).groupBy("symbol").agg(count(lit(1)))
    val f = first.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ticks.collect().foreach { r =>
      assert(f.getOrElse(r.getString(0), 0L) < r.getLong(1))
    }
    val rv = SparkEntry.queries("rolling_volume_range")(spark, sf)
    assert(rv.filter(col("qty").isNotNull && col("n_30min") < 1).isEmpty,
      "RANGE frame always includes the current (non-null) row")
  }
}
