package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One learned BPE merge: at step `idx`, the adjacent symbol pair
  * (`left`, `right`) had the highest corpus frequency `count` and was
  * fused into the new symbol `left + right`. */
final case class BpeMerge(idx: Int, left: String, right: String, count: Long)

/** Byte-pair-encoding tokenizer: the fit loop (`train`) and the
  * corpus-wide apply (`spacedDoc` + `applyMerges`) — step 2 of the
  * tokenizer-fit story `bpe_pair_counts` started.
  *
  * Representation and semantics (pinned, and mirrored verbatim by the
  * DuckDB oracle so both engines tokenize bit-identically):
  *  - a word is its symbols joined by single spaces, padded with one
  *    leading and one trailing space (" h e l l o "); a document is its
  *    words' spaced forms joined by " | " — the boundary symbol never
  *    appears in the alphabet, so no merge can cross a word boundary;
  *  - pair counting slides over each word's symbol sequence
  *    (overlapping, non-distinct), weighted by word frequency;
  *  - merge selection: highest count, ties broken by the
  *    lexicographically smallest "leftright" key — integer
  *    arithmetic only, so selection is exactly reproducible;
  *  - merge APPLICATION is two left-to-right non-overlapping
  *    `replace(" l r ", " lr ")` passes. One pass misses a pair whose
  *    leading space was consumed by the immediately preceding
  *    replacement ("a b a b" → "ab a b"); the second pass catches all
  *    such leftovers, which are isolated by then. The result diverges
  *    from scan-fold BPE only on ≥5-long runs of one repeated pair —
  *    absent from natural text — and in exchange the apply step is a
  *    pure codegen'd string expression in Spark and a plain `replace`
  *    in the oracle, with identical semantics guaranteed by both
  *    engines' standard single-pass replace.
  *
  * Scale shape: training input is the corpus-wide WORD-FREQUENCY table
  * — one token-stream hash-agg bounded by the true vocabulary, capped
  * to the `maxVocab` most frequent words (the GPT-2-style trainer
  * truncation; rank by count desc then word, so the cap is
  * deterministic). The merge loop itself runs driver-side on that
  * bounded table — the merge list IS the model, a few dozen rows.
  * Application is a narrow per-row map (2·nMerges chained replaces,
  * whole-stage codegen'd): zero shuffles over the corpus at any size.
  */
object BpeOps {

  /** Corpus-wide word frequencies — the trainer's (bounded) input
    * (empty tokens excluded, [[neTokens]]'s rule). */
  def wordFrequencies(docs: DataFrame, text: String = "text"): DataFrame =
    docs.select(explode(neTokens(col(text))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** The fit loop: `nMerges` greedy merges over a word-frequency table.
    * Pure integer bookkeeping — deterministic for a deterministic
    * input. Stops early when no adjacent pair remains. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[BpeMerge] = {
    var words = wordFreq.map { case (w, f) =>
      (" " + w.map(_.toString).mkString(" ") + " ", f)
    }
    val merges = Seq.newBuilder[BpeMerge]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = scala.collection.mutable.LinkedHashMap
        .empty[(String, String), Long]
      words.foreach { case (s, f) =>
        val syms = s.trim.split(" ")
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // highest count; ties → lexicographically smallest combined
        // key (the same VARCHAR compare the oracle's ORDER BY runs)
        val ((l, r), c) = counts.minBy { case ((a, b), n) =>
          (-n, a + "" + b)
        }
        merges += BpeMerge(i, l, r, c)
        val (pat, rep) = (s" $l $r ", s" $l$r ")
        words = words.map { case (s, f) =>
          (s.replace(pat, rep).replace(pat, rep), f)
        }
        i += 1
      }
    }
    merges.result()
  }

  /** A document's spaced symbol form: per-word spaced characters,
    * words joined by the " | " boundary symbol, padded with one space
    * each side — the string [[applyMerges]] rewrites. Built from
    * substring indexing (not split-by-empty-pattern, whose trailing
    * empty element differs between engines). */
  def spacedDoc(text: Column): Column =
    concat(lit(" "),
      array_join(transform(neTokens(text), t =>
        array_join(transform(sequence(lit(1), length(t)),
          i => substring(t, i, lit(1))), " ")), " | "),
      lit(" "))

  /** Non-empty tokens — the BPE pipeline's uniform token rule: a
    * fully-empty/whitespace document yields zero tokens, not [""]
    * (whose spaced form diverges between engines: Spark's
    * sequence(1, 0) DESCENDS where DuckDB's string_split('','') is
    * empty). Mirrored by list_filter(length > 0) in the oracle. */
  private def neTokens(text: Column): Column =
    filter(TextOps.tokens(text), t => length(t) > 0)

  /** Chain the learned merges over a spaced form: two replace passes
    * per merge, in merge order — 2·nMerges codegen'd string ops. */
  def applyMerges(spaced: Column, merges: Seq[BpeMerge]): Column =
    merges.foldLeft(spaced) { (c, m) =>
      val pat = lit(s" ${m.left} ${m.right} ")
      val rep = lit(s" ${m.left}${m.right} ")
      call_function("replace",
        call_function("replace", c, pat, rep), pat, rep)
    }

  /** The merge chain applied as an EXECUTOR-SIDE LOOP over a broadcast
    * merge table — semantically identical to [[applyMerges]] (the same
    * two-pass literal replace per merge, in merge order; JVM
    * `String.replace` and Spark's `replace` expression share
    * literal-substring left-to-right semantics), but with CONSTANT plan
    * size: [[applyMerges]] inlines 2·nMerges expression nodes, which
    * codegens beautifully at 16 merges and blows plan/codegen limits at
    * a 32k-merge production vocabulary. Here the plan is one typed map;
    * the model ships once per executor via broadcast, and per-row cost
    * is the same O(len · nMerges) replace work the expression chain
    * does — still a pure narrow map, zero corpus shuffles at any scale.
    * BpeSpec pins loop ≡ chain, and ≡ the trainer's own fold at 1k+
    * merges; the registered `corpus_tokenize_loop` hash-matches the
    * same DuckDB oracle as the expression form. */
  def mergeLoop(docs: DataFrame, merges: Seq[BpeMerge],
                text: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (s" ${m.left} ${m.right} ", s" ${m.left}${m.right} "))
        .toArray)
    docs.select(col("doc_id").cast("long"),
        size(neTokens(col(text))).cast("long"),
        aggregate(transform(neTokens(col(text)), t => length(t)),
          lit(0L), (acc, x) => acc + x),
        spacedDoc(col(text)))
      .as[(Long, Long, Long, String)]
      .map { case (id, w, c, s0) =>
        val ms = bc.value
        var s = s0
        var i = 0
        while (i < ms.length) {
          val (pat, rep) = ms(i)
          s = s.replace(pat, rep).replace(pat, rep)
          i += 1
        }
        (id, w, c, s)
      }
      .toDF("doc_id", "n_words", "n_chars", "s")
  }

  /** [[tokenizeStats]] computed through [[mergeLoop]] — identical
    * output columns, production-vocab-sized plan. */
  def tokenizeStatsLoop(docs: DataFrame, merges: Seq[BpeMerge],
                        text: String = "text"): DataFrame =
    mergeLoop(docs, merges, text)
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        size(filter(split(trim(col("s")), " "), x => x =!= "|" && x =!= ""))
          .cast("long").as("n_bpe_tokens"),
        md5(trim(col("s"))).as("tokens_digest"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") /
          nullif(col("n_bpe_tokens"), lit(0L)), 6))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"), col("chars_per_token"), col("tokens_digest"))

  /** Per-document tokenization statistics + canonical-form digest:
    * word count, character count, BPE token count (boundary symbols
    * excluded), chars-per-token compression, and the md5 of the final
    * spaced form — the digest is what pins the full tokenization
    * against the oracle without shipping every token. */
  def tokenizeStats(docs: DataFrame, merges: Seq[BpeMerge],
                    text: String = "text"): DataFrame = {
    val s = applyMerges(spacedDoc(col(text)), merges)
    docs.select(col("doc_id"),
      size(neTokens(col(text))).cast("long").as("n_words"),
      aggregate(transform(neTokens(col(text)), t => length(t)),
        lit(0L), (acc, x) => acc + x).as("n_chars"),
      size(filter(split(trim(s), " "), x => x =!= "|" && x =!= ""))
        .cast("long").as("n_bpe_tokens"),
      md5(trim(s)).as("tokens_digest"))
      // nullif: a zero-token doc reports null compression in BOTH
      // engines (Spark's non-ANSI x/0 is null, DuckDB's is inf)
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") /
          nullif(col("n_bpe_tokens"), lit(0L)), 6))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"), col("chars_per_token"), col("tokens_digest"))
  }
}
