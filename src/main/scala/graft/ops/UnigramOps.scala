package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One unigram-LM vocabulary piece: subword `piece`, its final
  * Viterbi-EM count, and its smoothed log-probability on the 9-dp
  * portable grid. */
final case class UnigramPiece(piece: String, cnt: Long, logp: Double)

/** Unigram-LM (SentencePiece-style) tokenizer: the fit loop (`train`)
  * and the corpus-wide apply (`tokenizeStatsUnigram`) — the OTHER half
  * of production tokenization next to BPE (Kudo 2018, "Subword
  * Regularization": fit a unigram language model over a seed vocabulary
  * by EM, segment by Viterbi). BPE grows a vocabulary bottom-up by
  * merging; unigram starts from an over-complete substring vocabulary
  * and re-estimates/prunes top-down — multilingual pipelines fit it at
  * least as often.
  *
  * Semantics (pinned, and mirrored verbatim by the DuckDB oracle so
  * both engines train and tokenize bit-identically):
  *  - SEED: every substring occurrence of length 1..[[MaxPieceLen]]
  *    counts word-frequency-weighted; the vocabulary is all single
  *    chars (coverage guarantee) + the top `seedMulti` multi-char
  *    candidates by (count DESC, piece ASC);
  *  - SCORES: logp(p) = round(ln((cnt+1) / (total+V)), 9) — Laplace
  *    smoothing keeps zero-count pieces segmentable, and the 9-dp round
  *    is the repo's portable-ln discipline (BM25 idf, W/BASELINE.md):
  *    engines may differ in the last ulp of ln, never at 9 dp;
  *  - E-STEP (hard EM): Viterbi-segment every vocabulary word —
  *    DP[j] = max over piece lengths l of DP[j−l] + logp(w[j−l..j]),
  *    ties broken toward the LONGER last piece (l DESC; two candidates
  *    at one position with equal l are the same substring, so the
  *    tie-break is total) — then M-step recounts pieces from the
  *    chosen segmentations (integer counts: engine-portable by
  *    construction, the published soft-EM's fractional expected counts
  *    are not);
  *  - PRUNE (final): all single chars + the top (vocabSize − #chars)
  *    multi-char pieces by final (count DESC, piece ASC); final scores
  *    re-smoothed over the kept set. (The published algorithm prunes
  *    by loss delta every few EM steps; count-rank pruning once at the
  *    end is this implementation's documented simplification.)
  *
  * Scale shape (the BpeOps contract): training input is the
  * vocab-bounded word-frequency table (one corpus hash-agg), the EM
  * loop runs driver-side on that bounded table — the piece table IS
  * the model, tens of rows. Application is an executor-side loop over
  * a broadcast score map: constant plan size at any vocabulary, one
  * narrow map, zero corpus shuffles at any scale.
  */
object UnigramOps {

  /** Longest candidate piece. Pinned with the oracle's `range(1, 5)`. */
  val MaxPieceLen = 4

  /** Portable 9-dp half-up rounding of a double — the same
    * shortest-repr BigDecimal grid Spark's round() and DuckDB's
    * round(x, 9) land on. */
  private def r9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  private def smoothedScores(counts: Map[String, Long],
                             vocab: Seq[String]): Map[String, Double] = {
    val total = vocab.iterator.map(p => counts.getOrElse(p, 0L)).sum
    val v = vocab.size
    vocab.iterator.map(p => p ->
      r9(math.log((counts.getOrElse(p, 0L) + 1.0) / (total.toDouble + v))))
      .toMap
  }

  /** Viterbi segmentation of one word under a score map: best-scoring
    * piece sequence, ties toward the longer last piece. Shared by the
    * trainer's E-step and the corpus apply, so fit and apply cannot
    * drift. Total because every single char of the corpus is in the
    * vocabulary. */
  def viterbi(w: String, sc: Map[String, Double]): List[String] = {
    val n = w.length
    val dpScore = new Array[Double](n + 1)
    val dpLen = new Array[Int](n + 1) // winning last-piece length at j
    val reachable = new Array[Boolean](n + 1)
    reachable(0) = true
    var j = 1
    while (j <= n) {
      var bestScore = 0.0
      var bestL = 0
      var l = 1
      while (l <= math.min(MaxPieceLen, j)) {
        if (reachable(j - l)) {
          sc.get(w.substring(j - l, j)) match {
            case Some(lp) =>
              val s = dpScore(j - l) + lp
              if (bestL == 0 || s > bestScore ||
                  (s == bestScore && l > bestL)) {
                bestScore = s; bestL = l
              }
            case None => ()
          }
        }
        l += 1
      }
      if (bestL > 0) {
        dpScore(j) = bestScore; dpLen(j) = bestL; reachable(j) = true
      }
      j += 1
    }
    require(reachable(n),
      s"word '$w' not segmentable — a character is missing from the vocabulary")
    var pieces = List.empty[String]
    var k = n
    while (k > 0) {
      pieces = w.substring(k - dpLen(k), k) :: pieces
      k -= dpLen(k)
    }
    pieces
  }

  /** The fit loop over a word-frequency table: seed → `emRounds` hard-EM
    * rounds → final prune to `vocabSize`. Pure integer counts + 9-dp
    * scores — deterministic for a deterministic input. */
  def train(wordFreq: Seq[(String, Long)], seedMulti: Int = 64,
            emRounds: Int = 2, vocabSize: Int = 40): Seq[UnigramPiece] = {
    // seed: substring occurrence counts, length 1..MaxPieceLen
    val seedCnt = scala.collection.mutable.Map.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= math.min(MaxPieceLen, w.length - i)) {
          val p = w.substring(i, i + l)
          seedCnt(p) = seedCnt.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val chars = seedCnt.keysIterator.filter(_.length == 1).toSeq.sorted
    val multi = seedCnt.keysIterator.filter(_.length > 1).toSeq
      .sortBy(p => (-seedCnt(p), p)).take(seedMulti)
    val vocab = (chars ++ multi).sorted
    var counts: Map[String, Long] = vocab.map(p => p -> seedCnt(p)).toMap
    var round = 0
    while (round < emRounds) {
      val sc = smoothedScores(counts, vocab)
      val next = scala.collection.mutable.Map.empty[String, Long]
      wordFreq.foreach { case (w, f) =>
        viterbi(w, sc).foreach(p => next(p) = next.getOrElse(p, 0L) + f)
      }
      counts = next.toMap // unused pieces drop to 0 (smoothing keeps them)
      round += 1
    }
    val multiFinal = vocab.filter(_.length > 1)
      .sortBy(p => (-counts.getOrElse(p, 0L), p))
      .take(math.max(0, vocabSize - chars.size))
    val finalVocab = (chars ++ multiFinal).sorted
    val finalSc = smoothedScores(counts, finalVocab)
    finalVocab.map(p =>
      UnigramPiece(p, counts.getOrElse(p, 0L), finalSc(p)))
  }

  /** Non-empty tokens — the same uniform token rule as the BPE family
    * (BpeOps.neTokens): whitespace split, empties dropped. */
  private def neTokens(text: Column): Column =
    filter(TextOps.tokens(text), t => length(t) > 0)

  /** Per-document unigram tokenization statistics + canonical-form
    * digest — the corpus_tokenize twin for the unigram model: words
    * Viterbi-segmented in an EXECUTOR loop over the broadcast score
    * map (constant plan size at any vocabulary — the
    * corpus_tokenize_loop discipline), canonical form = per-word
    * pieces space-joined, words joined by ' | ' (the BPE digest
    * convention), md5-pinned against the oracle. */
  def tokenizeStatsUnigram(docs: DataFrame, model: Seq[UnigramPiece],
                           text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      model.map(m => m.piece -> m.logp).toMap)
    docs.select(col("doc_id").cast("long"), neTokens(col(text)))
      .as[(Long, Seq[String])]
      .map { case (id, words) =>
        val sc = bc.value
        val segs = words.map(w => viterbi(w, sc))
        val form = segs.map(_.mkString(" ")).mkString(" | ")
        val nTok = segs.iterator.map(_.size.toLong).sum
        val nChars = words.iterator.map(_.length.toLong).sum
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(form.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        (id, words.size.toLong, nChars, nTok, digest)
      }
      .toDF("doc_id", "n_words", "n_chars", "n_unigram_tokens",
        "tokens_digest")
      // nullif: a zero-token doc reports null compression in BOTH engines
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") /
          nullif(col("n_unigram_tokens"), lit(0L)), 6))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_unigram_tokens"), col("chars_per_token"),
        col("tokens_digest"))
  }
}
