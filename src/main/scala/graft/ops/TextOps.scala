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
}
