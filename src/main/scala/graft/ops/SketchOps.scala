package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketching with engine-portable determinism.
  *
  * HyperLogLog built from the md5/affine hash family (functions.Hashing)
  * instead of an RNG-seeded library sketch, so the DuckDB oracle can
  * rebuild the IDENTICAL register state and the registered query
  * hash-compares estimates — the same discipline as the MinHash and
  * count-min sketches. The register sum runs over exact integers
  * (2^(55−rho) via a bigint shift — every term is a power of two, the
  * sum fits 2^61 < int64), so partial-agg order cannot skew it; the
  * only float steps (one division, one ln in the small-range branch)
  * run on identical inputs in both engines and round to 6 dp.
  */
object SketchOps {

  /** Per-group HyperLogLog distinct-count estimate next to the exact
    * count and the relative error — the cardinality sketch evaluated
    * the way `minhash_est_error` evaluates Jaccard sketches.
    *
    * `m` registers (power of two, bucket = low bits of the 60-bit md5
    * hash; rho = leading-zero rank of the remaining 54 bits). Scale
    * shape: one scan → (groups × m)-bounded MAX hash-agg — registers
    * merge with MAX, which is exactly how a 1000-executor run or an
    * incremental daily refresh merges sketches; the exact count (the
    * eval baseline) is the only part that wouldn't scale, and at
    * production scale it is simply dropped. */
  def hllDistinctByGroup(df: DataFrame, group: Column, key: Column,
                         m: Int, alpha: Double): DataFrame =
    hllEstimate(hllRegisters(df, group, key, m),
      df.groupBy(group.as("grp")).agg(countDistinct(key).as("n_exact")),
      m, alpha)

  /** The per-(group, bucket) register maxima — the HLL's entire state.
    * MAX is associative, commutative, and idempotent, so registers from
    * any partitioning of the input (executors, micro-batches, daily
    * increments) MAX-merge into exactly the registers of the whole —
    * the property the streaming twin (streaming/StreamingSketch) leans
    * on. Only observed buckets appear; [[hllEstimate]] back-fills the
    * empty ones. */
  def hllRegisters(df: DataFrame, group: Column, key: Column,
                   m: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    val bits = java.lang.Long.numberOfTrailingZeros(m.toLong).toInt
    val hv = Hashing.md5Long(key.cast("string"))
    // integer bucket/remainder split: % and >> stay in int64 — a double
    // division here would shred the low bits of a 60-bit hash (53-bit
    // mantissa), silently corrupting every register
    val base = df.select(group.as("grp"), (hv % m).as("bucket"),
      shiftright(hv, bits).as("rem"))
    // rho = (61 − bits) − bit_length(rem): leading-zero rank of the
    // (60 − bits)-bit remainder + 1; bin() renders the minimal binary
    // string in both engines, so its length IS the bit length
    // (rem = 0 → every remainder bit zero → rho = 61 − bits)
    val rz = 61 - bits
    base
      .withColumn("rho", when(col("rem") === 0L, lit(rz))
        .otherwise(lit(rz) - length(bin(col("rem")))))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).cast("int").as("r"))
  }

  /** Estimate assembly from a register table (observed buckets only)
    * plus the exact counts (grp, n_exact) eval baseline. */
  def hllEstimate(registers: DataFrame, exact: DataFrame,
                  m: Int, alpha: Double): DataFrame = {
    val spark = registers.sparkSession
    val bits = java.lang.Long.numberOfTrailingZeros(m.toLong).toInt
    val rz = 61 - bits
    val buckets = spark.range(m).select(col("id").as("bucket"))
    val reg = registers.select(col("grp")).distinct()
      .crossJoin(broadcast(buckets))
      .join(registers, Seq("grp", "bucket"), "left")
      .withColumn("r", coalesce(col("r"), lit(0)))
    val sums = reg.groupBy(col("grp"))
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $rz - r)")).as("zsum"),
        sum(when(col("r") === 0, 1L).otherwise(0L)).as("v"))
    val raw = lit(alpha) * m * m * lit(math.pow(2.0, rz)) / col("zsum")
    sums.join(exact, "grp")
      .select(col("grp"), col("n_exact"),
        round(raw, 6).as("hll_raw"),
        // canonical small-range correction: linear counting off the
        // empty-register count when the raw estimate is under 2.5m
        round(when(raw <= 2.5 * m && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(raw), 6).as("hll_est"))
      .withColumn("rel_err",
        round(abs(col("hll_est") - col("n_exact")) /
          col("n_exact").cast("double"), 6))
  }

  /** K-minimum-values (bottom-k / KMV) sketch intersection estimate —
    * the set-operation sketch HLL cannot provide: each side keeps only
    * its k smallest distinct key hashes; the union's bottom-k of the
    * two samples yields a union-cardinality estimate ((k−1)·2^60 /
    * k-th hash) and the fraction of that union sample present in BOTH
    * side samples estimates Jaccard, so intersection ≈ J · |A∪B| —
    * audience overlap from two k-row sketches instead of a distinct
    * join. Same determinism discipline as the HLL/CMS ops: fixed md5
    * hashes (practically collision-free in 60 bits, totally ordered),
    * so bottom-k is unique and both engines build the identical
    * samples; floats appear only in the final estimate divisions.
    *
    * Small-set rule: a sample holding fewer than k hashes IS its set —
    * its exact count is the estimate (the (k−1)·2^60/kth formula
    * assumes a full sample and would collapse to ~k−1 otherwise), and
    * Jaccard divides by the union SAMPLE size, not k, so partially
    * filled sketches don't silently deflate the overlap.
    *
    * Scale shape: per-side bottom-k is a partial TakeOrdered (every
    * partition forwards ≤ k rows); everything after runs on ≤ 2k rows.
    * The exact intersection alongside is the eval baseline — dropped
    * at production scale, exactly like the HLL exact column. */
  def kmvOverlap(a: DataFrame, b: DataFrame, key: String,
                 k: Int): DataFrame = {
    def bottom(df: DataFrame) = df
      .select(Hashing.md5Long(col(key).cast("string")).as("hv")).distinct()
      .orderBy(col("hv").asc).limit(k)
    // no .cache(): the samples are k-row TakeOrdereds, cheap to
    // recompute per reuse — an unmanaged cache in a registered query
    // would accumulate entries across bench repetitions
    val ba = bottom(a)
    val bb = bottom(b)
    val unionSample = ba.unionByName(bb).select(col("hv")).distinct()
      .orderBy(col("hv").asc).limit(k)
    def estOf(df: DataFrame, kth: String, est: String) = df
      .agg(max(col("hv")).as(kth), count(lit(1)).as(s"n_$kth"))
      .select(col(kth), col(s"n_$kth"),
        when(col(s"n_$kth") < k, col(s"n_$kth").cast("double"))
          .otherwise(round(
            (lit(k - 1.0) * lit(math.pow(2.0, 60))) / col(kth), 6))
          .as(est))
    val x = unionSample
      .join(ba, Seq("hv"), "left_semi")
      .join(bb, Seq("hv"), "left_semi")
      .agg(count(lit(1)).as("x_in_both"))
    val exact = a.select(col(key)).distinct()
      .join(b.select(col(key)).distinct(), Seq(key), "inner")
      .agg(count(lit(1)).as("n_inter"))
    val ea = a.agg(countDistinct(col(key)).as("n_a"))
    val eb = b.agg(countDistinct(col(key)).as("n_b"))
    estOf(ba, "a_kth", "est_a")
      .crossJoin(estOf(bb, "b_kth", "est_b"))
      .crossJoin(estOf(unionSample, "u_kth", "est_union"))
      .crossJoin(x).crossJoin(exact).crossJoin(ea).crossJoin(eb)
      .select(col("n_a"), col("n_b"), col("n_inter"),
        col("est_a"), col("est_b"), col("est_union"), col("x_in_both"),
        round(col("x_in_both").cast("double") / col("n_u_kth"), 6)
          .as("jaccard_est"),
        round(round(col("x_in_both").cast("double") / col("n_u_kth"), 6) *
          col("est_union"), 6).as("est_inter"))
      .withColumn("rel_err",
        // null, not a crash, when the true intersection is empty
        round(abs(col("est_inter") - col("n_inter")) /
          nullif(col("n_inter").cast("double"), lit(0d)), 6))
  }

  /** CMS counter table (row_i, bucket, c) over a key column — the
    * join-size building block: d affine hash rows × w buckets, counts
    * of the key stream (with multiplicity). Same portable md5/affine
    * family as every graft sketch, so the oracle rebuilds identical
    * counters. One scan → (d·w)-bounded hash-agg with map-side
    * partials (each executor collapses its partitions to ≤ d·w rows
    * before the one shuffle — the sketch merge IS addition). */
  def cmsKeyCounters(df: DataFrame, key: Column, d: Int, w: Int): DataFrame = {
    val h = Hashing.h31(key.cast("string"))
    val rows = array(Hashing.affineCoeffs(d).zipWithIndex.map {
      case ((a, b), i) =>
        struct(lit(i).as("row_i"), (Hashing.affine(h, a, b) % w).as("bucket"))
    }: _*)
    df.select(explode(rows).as("rb"))
      .select(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Fused multi-key CMS counters: ONE scan of `df` builds the d×w
    * counter table for EVERY listed key column at once — each input row
    * explodes to |keys|·d (tag, row_i, bucket) cells, and one
    * (row_i, bucket) hash-agg emits a per-tag count column
    * (`c_<tag>`). The join-size estimator over a star schema needs
    * counters for several keys of the SAME fact table (lineitem:
    * orderkey/partkey/suppkey); building them per-pair scans the fact
    * 3× — this pays one scan and one shuffle per TABLE instead of one
    * per (pair, side). Output stays (d·w)-bounded: a cell hit by any
    * tag carries all tags' counts (zeros where a tag missed it, which
    * contribute nothing to an inner product). Counters are identical
    * bit-for-bit to [[cmsKeyCounters]]' — same h31/affine family. */
  def cmsMultiKeyCounters(df: DataFrame, keys: Seq[(String, Column)],
                          d: Int, w: Int): DataFrame = {
    // project each key's base hash ONCE per row, then build the
    // |keys|·d cells from the projected columns — inlining the md5
    // tree into every array element would evaluate it d times per key
    // and bloat the generated code past the codegen method limit
    // (measured: the inlined form ran interpreted and ~2× slower)
    val withH = df.select(keys.map { case (tag, key) =>
      Hashing.h31(key.cast("string")).as(s"__h_$tag") }: _*)
    // tags ride as their key-list INDEX (int), not the name string —
    // the conditional sums compare the tag once per exploded row and
    // the int form keeps the hot agg loop string-free
    val cells = array((for {
      ((tag, _), ti) <- keys.zipWithIndex
      ((a, b), i) <- Hashing.affineCoeffs(d).zipWithIndex
    } yield struct(lit(ti).as("tag"), lit(i).as("row_i"),
      (Hashing.affine(col(s"__h_$tag"), a, b) % w).as("bucket"))): _*)
    val perTag = keys.zipWithIndex.map { case ((tag, _), ti) =>
      sum(when(col("tag") === ti, 1L).otherwise(0L)).as(s"c_$tag")
    }
    withH.select(explode(cells).as("x"))
      .select(col("x.tag").as("tag"), col("x.row_i").as("row_i"),
        col("x.bucket").as("bucket"))
      .groupBy(col("row_i"), col("bucket"))
      .agg(perTag.head, perTag.tail: _*)
  }

  /** Sketch-based equi-join cardinality estimate (the AMS/CMS inner
    * product): |A ⋈ B| = Σ_k f_A(k)·f_B(k) estimated as the MIN over
    * the d hash rows of Σ_bucket cA·cB — each row's inner product
    * overcounts by the colliding cross terms (E[extra] ≈ nA·nB/w), so
    * the min is the tightest upper bound the sketch offers. This is
    * what a cost-based planner consults to choose shuffle vs broadcast
    * BEFORE running the join: two single-scan sketches + an O(d·w)
    * merge, no key exchange. All arithmetic is exact integer (counter
    * products summed as longs), so the estimate is engine-portable
    * bit-for-bit. */
  def cmsJoinSizeEst(a: DataFrame, aKey: Column,
                     b: DataFrame, bKey: Column,
                     d: Int, w: Int): DataFrame =
    cmsKeyCounters(a, aKey, d, w).withColumnRenamed("c", "ca")
      .join(cmsKeyCounters(b, bKey, d, w).withColumnRenamed("c", "cb"),
        Seq("row_i", "bucket"))
      .groupBy(col("row_i"))
      .agg(sum(col("ca") * col("cb")).as("ip"))
      // sides sharing NO (row, bucket) cells produce zero ip rows —
      // the inner product is 0 per row, so the estimate is 0, not null
      .agg(coalesce(min(col("ip")), lit(0L)).cast("long").as("est_rows"))
}
