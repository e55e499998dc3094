package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for a training-data pipeline: tokenization,
  * language-ID heuristic, quality scoring, document fingerprinting.
  *
  * Everything is built from codegen'd built-ins and higher-order array
  * functions — no UDFs — so whole-stage codegen spans the full pipeline
  * and the same logic is expressible as the DuckDB oracle. At 100 TB these
  * are embarrassingly parallel narrow maps: no shuffle at all until a
  * downstream aggregation.
  */
object TextOps {

  /** Whitespace tokenization (the BPE-ish regex variant is in
    * [[tokenCounts]]). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word-ish token pattern shared with the oracle: letter runs, digit
    * runs, or single punctuation marks — a BPE-pretokenizer shape. */
  final val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token statistics per document. */
  def tokenCounts(docs: DataFrame, text: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col(text))).as("n_ws_tokens"),
      // Spark SQL string literals consume one level of backslash escaping
      // (DuckDB's don't) — double them here only.
      size(expr(s"regexp_extract_all($text, '${TokenPattern.replace("\\", "\\\\")}', 0)")).as("n_re_tokens"),
      length(col(text)).as("n_chars_measured"))

  /** Tiny per-language function-word lists for the lang-ID heuristic.
    * Order matters: it is the deterministic tie-break preference. */
  final val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in"),
    "de" -> Seq("der", "die", "und", "das", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "los", "y", "que", "una", "por"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(
      array(words.map(lit): _*), t)))

  /** N-gram/stopword language-ID heuristic: score = function-word hits per
    * language; predicted language = argmax with fixed preference order.
    * (On the synthetic corpus accuracy is incidental; the operator shape —
    * a pure narrow map — is what scales.) */
  def langId(docs: DataFrame, text: String = "text"): DataFrame = {
    val toks = tokens(col(text))
    val scored = docs.select(
      (col("doc_id") +: col("lang").as("labeled_lang") +:
        StopwordSets.map { case (l, ws) =>
          stopwordHits(toks, ws).as(s"score_$l")
        }): _*)
    // argmax via CASE chain in declared preference order (>= keeps the
    // earlier language on ties) — identical in the oracle SQL.
    val pred = StopwordSets.map(_._1).dropRight(1).foldRight(
      lit(StopwordSets.last._1)) { (l, rest) =>
      val cond = StopwordSets.map(_._1).filter(_ != l)
        .map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
      when(cond, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * token length — composable signals for corpus filtering. */
  def qualityScore(docs: DataFrame, text: String = "text"): DataFrame = {
    val toks = tokens(col(text))
    val nTok = size(toks).cast(DoubleType)
    val nChar = length(col(text)).cast(DoubleType)
    val punct = (nChar - length(regexp_replace(col(text), "[.,;:!?]", "")))
    val stopHits = stopwordHits(toks, StopwordSets.head._2).cast(DoubleType)
    val meanTokLen = aggregate(toks, lit(0L),
      (acc, t) => acc + length(t)).cast(DoubleType) / nTok
    docs.select(
        col("doc_id"), col("lang"),
        nChar.as("n_chars_m"),
        nTok.as("n_tokens"),
        round(punct / nChar, 6).as("punct_ratio"),
        round(stopHits / nTok, 6).as("stopword_ratio"),
        round(meanTokLen, 6).as("mean_token_len"))
      .withColumn("quality_score",
        round(least(col("n_tokens") / 100.0, lit(1.0)) * 0.5
          + col("stopword_ratio") * 0.3
          + (lit(1.0) - col("punct_ratio")) * 0.2, 6))
  }

  /** Gopher's stop-word rule list (Rae et al. 2021, §A1.1.2). */
  final val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-rule composite (Rae et al. 2021, appendix A1 —
    * the published rule set most open-corpus pipelines start from),
    * adapted to the whitespace-token fixture: per doc one flag per rule
    * plus the conjunction. Word-count window 50..100k, mean word length
    * 3..10, ≥80% words containing an alphabetic character, ≥2 stop-word
    * hits, and top-bigram share ≤0.18 (the repetition rule — docs too
    * short to have a bigram pass it vacuously, matching the paper's
    * "not applicable" treatment). On this fixture the word-count and
    * stop-word rules discriminate (median 56 tokens; stop words are
    * language-dependent), the length rules document their bounds.
    *
    * Shape: one narrow per-row pass for four rules + the
    * `bigramProfile` per-doc hash-agg for the fifth, joined on doc_id —
    * two scans, one key shuffle, no windows. */
  def gopherRules(docs: DataFrame, text: String = "text"): DataFrame = {
    val t = docs.select(col("doc_id"), tokens(col(text)).as("toks"))
    val n = size(col("toks"))
    val meanLen = aggregate(col("toks"), lit(0L), (a, x) => a + length(x))
      .cast(DoubleType) / n
    val alphaFrac = size(filter(col("toks"), x => x.rlike("[A-Za-z]")))
      .cast(DoubleType) / n
    val stopHits = size(filter(col("toks"),
      x => array_contains(array(GopherStops.map(lit): _*), x)))
    val flags = t.select(
      col("doc_id"),
      n.cast("long").as("n_tokens"),
      (n >= 50 && n <= 100000).cast("int").as("r_word_count"),
      (meanLen >= 3.0 && meanLen <= 10.0).cast("int").as("r_mean_word_len"),
      (alphaFrac >= 0.8).cast("int").as("r_alpha_words"),
      (stopHits >= 2).cast("int").as("r_stopwords"))
    val rep = CorpusOps.bigramProfile(docs)
      .select(col("doc_id"), col("top_bigram_frac"))
    flags.join(rep, Seq("doc_id"), "left")
      .withColumn("r_repetition",
        coalesce(col("top_bigram_frac") <= 0.18, lit(true)).cast("int"))
      .withColumn("passes",
        (col("r_word_count") === 1 && col("r_mean_word_len") === 1 &&
          col("r_alpha_words") === 1 && col("r_stopwords") === 1 &&
          col("r_repetition") === 1).cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("r_word_count"),
        col("r_mean_word_len"), col("r_alpha_words"), col("r_stopwords"),
        col("r_repetition"), col("passes"))
  }

  /** Word k-shingles of a document (distinct, as the dedup unit).
    * Guarded: Spark's sequence(1, n) DESCENDS for n<1, so short docs get
    * an explicit empty array. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>")))
  }

  /** Document fingerprint: min/max/count over the shingle hash set — a
    * winnowing-style content signature that survives reordering of the
    * pipeline and is joinable at scale.
    *
    * Computed over the exploded hashed relation (one md5 per shingle,
    * codegen'd hash-aggregate) rather than per-row array lambdas, which
    * are interpreted and evaluate the hash array once per aggregate.
    * Note: a doc with < k tokens has no shingles and drops out (fixture
    * minimum is 10 tokens); the array formulation would return nulls. */
  def fingerprints(docs: DataFrame, k: Int = 3, text: String = "text"): DataFrame =
    DedupOps.docShingleHashes(docs, k, text)
      .groupBy(col("doc_id"))
      .agg(
        min(col("sh_h")).as("fp_min"),
        max(col("sh_h")).as("fp_max"),
        count(lit(1)).as("n_shingles"))

  /** Per-document average unigram log-probability under the corpus's own
    * unigram LM — the classic cheap fluency/repetitiveness signal for
    * corpus filtering (low avg log-prob ⇒ rare-token soup; high ⇒
    * boilerplate). Two hash-aggregates (vocabulary counts + per-doc
    * score) and one token→vocab equi-join; the vocabulary relation is
    * unbounded so no broadcast hint — AQE decides.
    *
    * Determinism: each token's log-prob is rounded to 9 dp (cnt/total is
    * a single IEEE-exact division; ln agrees across engines at that
    * precision — same discipline as tfidf_top_terms) and the per-doc sum
    * runs in exact decimals, so partial-agg order can't skew the float
    * result. */
  def unigramLogProb(docs: DataFrame, text: String = "text"): DataFrame = {
    val tokens = docs.select(col("doc_id"),
      explode(TextOps.tokens(col(text))).as("token"))
    val total = tokens.agg(count(lit(1)).cast("double").as("n_total"))
    val lp = tokens.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(total)
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("n_total")), 9).as("lp"))
    tokens.join(lp, Seq("token"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lp").cast("decimal(30,9)")).cast("double") /
          count(lit(1)), 6).as("avg_logprob"))
  }

  /** Count-min sketch heavy-hitter estimation over the token stream:
    * d independent hash rows × w buckets, estimate = min over rows of
    * the bucket counter — the classic mergeable sketch for frequency
    * estimation when the vocabulary doesn't fit anywhere (CMS
    * guarantees est ≥ exact; overcount ≤ εN with prob 1−δ at
    * w = e/ε, d = ln 1/δ). Hashes come from the engine-portable
    * md5/affine family (functions.Hashing), so the DuckDB oracle
    * reproduces the sketch bit-for-bit and the registered query can
    * hash-compare estimates — an eval no RNG-seeded sketch allows.
    *
    * Scale shape: ONE token-stream scan exploded d× straight into a
    * (d·w)-bounded hash-agg — partial aggregation collapses every
    * partition to ≤ d·w counter rows before the shuffle, exactly the
    * sketch-merge a 1000-executor run performs; the probe side joins
    * the counters on (row, bucket) equality. Output per probe token:
    * exact count, CMS estimate, overcount (est − exact, ≥ 0). */
  def cmsTokenEstimates(docs: DataFrame, d: Int, w: Int, topN: Int,
                        text: String = "text"): DataFrame = {
    val toks = docs.select(explode(tokens(col(text))).as("token"))
    val rowBuckets = cmsRowBuckets(d, w)
    val counters = cmsCounters(toks, d, w)
    val probes = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("exact_count"))
      .orderBy(col("exact_count").desc, col("token").asc)
      .limit(topN)
    probes
      .select(col("token"), col("exact_count"), explode(rowBuckets).as("rb"))
      .select(col("token"), col("exact_count"),
        col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .join(counters, Seq("row_i", "bucket"))
      .groupBy(col("token"), col("exact_count"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("token"), col("exact_count"), col("cms_est"),
        (col("cms_est") - col("exact_count")).as("overcount"))
  }

  /** The per-token (row_i, bucket) hash array shared by the counter
    * build and the probe side — one source of truth for the sketch's
    * hash placements. */
  private def cmsRowBuckets(d: Int, w: Int): Column = {
    val h = Hashing.h31(col("token"))
    array(Hashing.affineCoeffs(d).zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("row_i"),
        (Hashing.affine(h, a, b) % w).as("bucket")) }: _*)
  }

  /** The raw CMS counter table (row_i, bucket, c) over a `token` column
    * — the sketch itself, exposed so specs can assert structural
    * invariants (per-row mass conservation) on the actual counters. */
  def cmsCounters(toks: DataFrame, d: Int, w: Int): DataFrame =
    toks.select(explode(cmsRowBuckets(d, w)).as("rb"))
      .select(col("rb.row_i").as("row_i"), col("rb.bucket").as("bucket"))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** PII patterns, in redaction-application order. Regex stays in the
    * dialect subset Java and RE2 (DuckDB) share: word boundaries,
    * bounded quantifiers, character classes — no lookaround, no
    * backreferences. Tags contain no regex/replacement metacharacters.
    */
  final val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("card", "\\b\\d{4}( \\d{4}){3}\\b", "[CARD]"))

  /** PII detect + redact in one narrow map: per-class match counts, the
    * total, and a digest of the text after all classes are replaced (in
    * [[PiiPatterns]] order — the order matters where classes could
    * overlap, so both engines apply the same sequence). Pure per-row
    * regex work — codegen'd, no shuffle, embarrassingly parallel at any
    * scale; the digest (not the redacted text) keeps the output narrow.
    */
  def piiScan(docs: DataFrame, text: String = "text"): DataFrame = {
    val counts = PiiPatterns.map { case (kind, re, _) =>
      regexp_count(col(text), lit(re)).cast("long").as(s"n_$kind") }
    val total = PiiPatterns.map { case (kind, re, _) =>
      regexp_count(col(text), lit(re)).cast("long") }.reduce(_ + _)
    val redacted = PiiPatterns.foldLeft(col(text)) {
      case (c, (_, re, tag)) => regexp_replace(c, re, tag) }
    docs.select((col("doc_id") +: counts) ++ Seq(
      total.as("n_pii"), md5(redacted).as("redacted_digest")): _*)
  }

  // ---------------------------------------------------------------------
  // Bigram LM with stupid backoff — the CCNet-style fluency filter
  // ---------------------------------------------------------------------

  /** Train/eval split shared by the bigram-LM family: the md5 bucket
    * convention of `corpus_split` (< 90 = train, ≥ 90 = held-out). */
  private def splitBucket: Column =
    Hashing.md5Long(col("doc_id").cast("string")) % 100

  /** Adjacent-token transitions of a `toks` array column, exploded to
    * (w1, w2) rows — a narrow map (no shuffle, no self-join): the pair
    * list is built per row with a higher-order transform. */
  private def transitions(extra: Column*): Seq[Column] =
    extra :+ expr(
      "explode(transform(sequence(0, size(toks) - 2), " +
        "i -> struct(toks[i] AS w1, toks[i + 1] AS w2)))").as("p")

  /** Bigram + unigram counts of the train split: the language model.
    * Returns (bigram counts c12 keyed (w1,w2), unigram counts c1 keyed
    * token, scalar (n_train, v_train)). Each is ONE exploded-scan
    * hash-agg: vocabulary- / seen-bigram-bounded, partial aggregation
    * collapses per-partition before the shuffle — the same two tables a
    * 1000-executor run would materialize once and reuse. */
  private[graft] def bigramCounts(docs: DataFrame, text: String = "text")
      : (DataFrame, DataFrame, DataFrame) = {
    val train = docs
      .select(col("doc_id"), tokens(col(text)).as("toks"))
      .filter(splitBucket < 90)
    val trainToks = train.select(explode(col("toks")).as("token"))
    val uni = trainToks.groupBy(col("token")).agg(count(lit(1)).as("c1"))
    val nv = trainToks.agg(count(lit(1)).cast(DoubleType).as("n_train"))
      .crossJoin(uni.agg(count(lit(1)).cast(DoubleType).as("v_train")))
    val big = train.filter(size(col("toks")) >= 2)
      .select(transitions(): _*)
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    (big, uni, nv)
  }

  /** The trained bigram model's head: top `topN` transitions by count
    * with their 9-dp conditional log-probability ln(c12/c1) — the
    * inspectable artifact of the fit (TakeOrdered top-N, no full sort). */
  def bigramModel(docs: DataFrame, topN: Int = 50,
                  text: String = "text"): DataFrame = {
    val (big, uni, _) = bigramCounts(docs, text)
    big.join(uni.withColumnRenamed("token", "w1"), Seq("w1"))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(col("c12").cast(DoubleType) / col("c1")), 9).as("lp"))
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
      .limit(topN)
  }

  /** Stupid-backoff bigram scoring of the HELD-OUT split (the
    * CCNet-style fluency signal next to [[unigramLogProb]]): the model
    * is fit on the 90% train split and scores the 10% it never saw, so
    * unseen transitions genuinely occur and the backoff path is
    * exercised — the deployment shape (CCNet fits on a reference
    * corpus, scores the crawl).
    *
    * score(w1→w2) = c(w1,w2)/c(w1) when the bigram was seen in train,
    * else 0.4·(c(w2)+1)/(N+V) (stupid backoff, Brants et al. 2007
    * "Large Language Models in Machine Translation", with +1 unigram
    * smoothing so out-of-vocabulary w2 stays finite). Log-scores
    * rounded to 9 dp; per-doc sums as DECIMAL(30,9) so partial-agg
    * order can't skew the float; docs with < 2 tokens have no
    * transition and are omitted.
    *
    * Scale: scoring is two equality joins of the eval transitions
    * against the vocab-bounded count tables — broadcastable when the
    * model is small, plain shuffle joins otherwise; no windows, no
    * driver-side state. */
  def bigramScores(docs: DataFrame, text: String = "text"): DataFrame = {
    val (big, uni, nv) = bigramCounts(docs, text)
    bigramScoreAgainst(big, uni, nv)(docs, text)
  }

  /** Frozen-model form of [[bigramScores]]: score `docs`' held-out
    * split against ALREADY-FITTED count tables. This is the deployment
    * split CCNet actually runs — fit once, score forever — and what the
    * streaming twin applies per micro-batch (scoring is per-doc pure
    * given the fixed model: every transition of a doc lives in its own
    * row, so any micro-batch slicing yields the identical result). */
  def bigramScoreAgainst(big: DataFrame, uni: DataFrame, nv: DataFrame)
                        (docs: DataFrame, text: String = "text"): DataFrame = {
    val evalPairs = docs
      .select(col("doc_id"), col("lang"), tokens(col(text)).as("toks"))
      .filter(splitBucket >= 90 && size(col("toks")) >= 2)
      .select(transitions(col("doc_id"), col("lang")): _*)
      .select(col("doc_id"), col("lang"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val u1 = uni.select(col("token").as("w1"), col("c1").as("c1_w1"))
    val u2 = uni.select(col("token").as("w2"), col("c1").as("c1_w2"))
    evalPairs
      .join(big, Seq("w1", "w2"), "left")
      .join(u1, Seq("w1"), "left")
      .join(u2, Seq("w2"), "left")
      .crossJoin(nv)
      .select(col("doc_id"), col("lang"),
        when(col("c12").isNotNull, lit(0L)).otherwise(lit(1L)).as("backoff"),
        round(log(
          when(col("c12").isNotNull,
            col("c12").cast(DoubleType) / col("c1_w1"))
            // nullif: an EMPTY train split (N = V = 0) yields null
            // scores instead of an ANSI divide-by-zero — the seen-pair
            // branch needs no guard (c12 present ⇒ c1_w1 ≥ c12 > 0)
            .otherwise(lit(0.4) * (coalesce(col("c1_w2"), lit(0L)) + lit(1)) /
              nullif(col("n_train") + col("v_train"), lit(0.0)))), 9).as("lp"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("backoff")).as("n_backoff"),
        round(sum(col("lp").cast("decimal(30,9)")).cast(DoubleType) /
          count(lit(1)), 6).as("avg_lp"))
  }

  /** CCNet's per-language perplexity buckets over the held-out scores:
    * ntile(3) within each language ordered by avg log-prob descending —
    * head = most fluent third, tail = least. Per-language windows see
    * only that language's eval slice (the `customer_deciles` /
    * `domain_quota_sample` window discipline); at petabyte scale the
    * cuts would come from approx quantiles instead — this form is the
    * exact-tercile reference. */
  def pplBuckets(docs: DataFrame, text: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("avg_lp").desc, col("doc_id").asc)
    bigramScores(docs, text)
      .withColumn("t", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("avg_lp"),
        when(col("t") === 1, lit("head"))
          .when(col("t") === 2, lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
