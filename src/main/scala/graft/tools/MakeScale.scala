package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-fixture synthesizer: replicate a source fixture N× with
  * deterministic perturbations, preserving each table's schema and the
  * SHAPE a real scale-up has — fact tables grow, dimension tables don't,
  * key cardinality grows with the facts, and replicated payloads are
  * decorrelated so pair-producing operators (dedup, ANN) don't see an
  * artificial quadratic explosion of cross-copy near-duplicates:
  *
  *  - events: ids/users shifted per copy (10× keys, same symbols —
  *    more rows per symbol, the real 100 TB shape); ts written back as
  *    INT64 nanos, the source fixture's physical type
  *  - lineitem/orders: order keys shifted IN LOCKSTEP (join consistency);
  *    customer/part/supplier references unchanged (dims are fixed, so
  *    per-dim load grows — exactly what breaks naive plans at scale)
  *  - documents: every word suffixed per copy — shingles/minhash/simhash
  *    all decorrelate, so near-dup structure stays per-copy
  *  - embeddings: deterministic per-copy sign-flip pattern (measured
  *    ~50% flip agreement between copies → expected cross-copy cosine
  *    ≈ 0), preserving norms exactly
  *  - dims (customer/supplier/part/nation/region): copied verbatim
  *
  * HOT-KEY MODE (4th arg `hot`): same tables, but with planted Zipf-style
  * hot keys — the skew shape MakeScale's uniform mode deliberately lacks
  * ("more keys, not hotter keys"). 20% of events collapse onto ONE
  * user_id (behavioral joins/aggs), a DIFFERENT 20% onto ONE symbol
  * (tick aggs and symbol windows), and 20% of orders onto ONE o_custkey
  * (customer-keyed joins). Masks key off event_id/o_orderkey pmod 5, so
  * they are deterministic, disjoint per axis, and spread evenly over
  * copies/dates — the hot key is hot EVERYWHERE, the worst case for a
  * static partitioning.
  *
  * ZIPF MODE (4th arg `zipf`): documents are REGENERATED (not
  * replicated) with a power-law token draw — 70% shared Zipf(1)
  * vocabulary of 50k ranks, 30% per-language 2k ranks — giving the df
  * histogram a real corpus has (head stopwords + discriminative tail).
  * This is the positive-regime fixture for idf-weighted retrieval and
  * language classification (the flat source law is ~85% shared jargon,
  * where those evals are honest negatives by construction). Other
  * tables are synthesized as in uniform mode.
  *
  *   sbt "runMain graft.tools.MakeScale /root/testdata/sf0.1 /tmp/graft_sf1 10"
  *   sbt "runMain graft.tools.MakeScale /root/testdata/sf0.1 /tmp/graft_sf1_hot 10 hot"
  *   sbt "runMain graft.tools.MakeScale /root/testdata/sf0.1 /tmp/graft_zipf 1 zipf documents"
  *   // 5th arg: comma-list restricting which tables to synthesize
  *   // (decade spot-checks, e.g. x100 embeddings alone):
  *   sbt "runMain graft.tools.MakeScale /root/testdata/sf0.1 /tmp/sf10e 100 uniform embeddings"
  */
object MakeScale {
  /** One hot user (~20% of events), disjoint from shifted real ids. */
  val HotUser  = 777777777L
  /** One hot symbol (~20% of events; suffix-stripped to "HOT"). */
  val HotSym   = "HOT.NSE"
  /** One hot customer (~20% of orders). */
  val HotCust  = 777777777L

  def main(args: Array[String]): Unit = {
    val (src, dest, copies) = (args(0), args(1), args(2).toInt)
    val hot = args.length > 3 && args(3) == "hot"
    val zipf = args.length > 3 && args(3) == "zipf"
    val only: Option[Set[String]] =
      if (args.length > 4) Some(args(4).split(',').toSet) else None
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def out(name: String)(df: => DataFrame): Unit = if (wanted(name)) {
      df.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[makescale] $name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }
    def replicate(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(c => f(base, c)).reduce(_ unionByName _)

    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      out(t)(Tables.load(spark, src, t))
    }

    out("events")(replicate(Tables.events(spark, src)) { (d, c) =>
      val eid = col("event_id") + lit(c.toLong * 1000000000L)
      val user = col("user_id") + lit(c.toLong * 1000000L)
      d.select(
        eid.as("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts"),
        (if (hot) when(pmod(eid, lit(5L)) === 0, lit(HotUser)).otherwise(user)
         else user).as("user_id"),
        (if (hot) when(pmod(eid, lit(5L)) === 1, lit(HotSym))
            .otherwise(col("event_type"))
         else col("event_type")).as("event_type"),
        (col("value") * (lit(1.0) + lit(c.toDouble) * 0.0001)).as("value"),
        col("props"))
    })

    out("lineitem")(replicate(Tables.lineitem(spark, src)) { (d, c) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(c.toLong * 100000000L))
    })
    out("orders")(replicate(Tables.orders(spark, src)) { (d, c) =>
      val shifted = d.withColumn("o_orderkey",
        col("o_orderkey") + lit(c.toLong * 100000000L))
      if (hot) shifted.withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(5L)) === 0, lit(HotCust))
          .otherwise(col("o_custkey")))
      else shifted
    })

    out("documents")(replicate(Tables.documents(spark, src)) { (d, c) =>
      if (zipf) {
        // ZIPF MODE: regenerate every doc's text with a power-law token
        // draw instead of replicating the source fixture's flat-df
        // vocabulary. Inverse-CDF for the s=1 Zipf law: a deterministic
        // uniform u ∈ [0,1) (xxhash64 of (doc_id, position)) maps to
        // rank V^u, whose density is ∝ 1/rank — the df histogram a real
        // web corpus has (head stopwords, long discriminative tail).
        // 70% of positions draw from a SHARED 50k-rank vocabulary, 30%
        // from a per-LANGUAGE 2k-rank one — so language classifiers and
        // idf-weighted retrieval get the separable signal the flat
        // fixture's shared-jargon law denies them (three round-11
        // honest-negative evals were negative for exactly that reason).
        val id = (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id")
        val idc = col("doc_id") + lit(c.toLong * 1000000L)
        val n = (lit(40) + pmod(idc, lit(41L))).cast("int")
        val t = array_join(
          transform(sequence(lit(0), n - 1), i => {
            val u1 = (pmod(xxhash64(idc, i, lit(1)), lit(1000000000L))
              .cast("double") / lit(1.0e9))
            val u2 = (pmod(xxhash64(idc, i, lit(2)), lit(1000000000L))
              .cast("double") / lit(1.0e9))
            val shared = floor(pow(lit(50000.0), u1)).cast("long")
            val perLang = floor(pow(lit(2000.0), u1)).cast("long")
            when(u2 < 0.7, concat(lit("w"), shared))
              .otherwise(concat(col("lang"), lit("w"), perLang))
          }), " ")
        d.select(id, t.as("text"), col("lang"), col("source"),
          length(t).cast("long").as("n_chars"))
      } else {
        val t =
          if (c == 0) col("text")
          else array_join(
            transform(split(col("text"), " "), w => concat(w, lit(s"_$c"))),
            " ")
        d.select(
          (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
          t.as("text"), col("lang"), col("source"),
          length(t).cast("long").as("n_chars"))
      }
    })

    out("embeddings")(replicate(Tables.embeddings(spark, src)) { (d, c) =>
      val e =
        if (c == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          x * when(shiftright((i + 1).cast("long") *
              lit(2654435761L + c.toLong * 1046527L), 16) % 2 === 0,
            lit(1.0f)).otherwise(lit(-1.0f)))
      d.select(
        (col("vec_id") + lit(c.toLong * 1000000L)).as("vec_id"),
        e.as("embedding"), col("label"))
    })

    spark.stop()
  }
}
