package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One learned WordPiece merge: at step `idx` the adjacent symbol pair
  * (`left`, `right`) maximized the scaled likelihood ratio `score` =
  * ⌊c(l,r)·10¹² / (c(l)·c(r))⌋ (pair count `count` kept for
  * inspection); the fused symbol is `left + right.drop(2)` — the "##"
  * continuation marker belongs to a symbol's position, not its text. */
final case class WpMerge(idx: Int, left: String, right: String,
                         count: Long, score: Long)

/** WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer's
  * trainer) — the third tokenizer family next to BPE (frequency-greedy)
  * and unigram-LM (EM-pruned): the SAME greedy merge loop as BPE but
  * scored by the LIKELIHOOD RATIO c(pair)/(c(left)·c(right)) — "merge
  * what co-occurs more than its parts predict", which prefers cohesive
  * rare pairs over merely frequent ones.
  *
  * Representation (pinned, mirrored by the DuckDB oracle):
  *  - a word's symbols carry the "##" continuation prefix from position
  *    2 on (" h ##e ##l ##l ##o "); merging keeps the left symbol's
  *    prefix and strips the right's, so word-initial pieces stay plain
  *    and interior pieces stay "##"-marked — the BERT convention;
  *  - the boundary discipline, two-pass replace application, and
  *    word-frequency-table training input are [[BpeOps]]'s verbatim;
  *  - selection: the score is computed in SCALED INTEGER space
  *    (⌊c·10¹²/(c_l·c_r)⌋ — both engines do the identical integer
  *    division, so cross-engine float drift is impossible), ties broken
  *    by the chr(1)-joined pair key ascending.
  *
  * Scale shape: identical to BPE — training runs driver-side on the
  * vocabulary-bounded word-frequency table (the merge list IS the
  * model); application is a narrow per-row map, zero corpus shuffles.
  */
object WordPieceOps {

  /** Integer scale of the likelihood-ratio score. With the pair-count
    * guard in [[train]], c·Scale stays far below Long.MaxValue. */
  val Scale = 1000000000000L

  /** " h ##e ##l ##l ##o " — the WordPiece spaced form of a word. */
  private def spacedWord(w: String): String =
    " " + w.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c
    }.mkString(" ") + " "

  /** The fit loop: `nMerges` greedy likelihood-ratio merges over a
    * word-frequency table. Pure integer bookkeeping — deterministic for
    * a deterministic input; stops early when no pair remains. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[WpMerge] = {
    var words = wordFreq.map { case (w, f) => (spacedWord(w), f) }
    val merges = Seq.newBuilder[WpMerge]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairCounts = scala.collection.mutable.LinkedHashMap
        .empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (s, f) =>
        val syms = s.trim.split(" ")
        var j = 0
        while (j < syms.length) {
          symCounts(syms(j)) = symCounts.getOrElse(syms(j), 0L) + f
          if (j < syms.length - 1) {
            val p = (syms(j), syms(j + 1))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          }
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val scored = pairCounts.map { case ((l, r), c) =>
          require(c < 9000000L,
            s"pair count $c overflows the 10^12-scaled score; shrink the " +
              "trainer input or lower Scale")
          // the divisor is its own unguarded Long multiply: two symbols
          // each weighted above ~3.04e9 would overflow the product and
          // silently flip the score sign — fail loudly like the c guard
          require(symCounts(l) <= Long.MaxValue / symCounts(r),
            s"symbol-count product ${symCounts(l)}*${symCounts(r)} for " +
              s"('$l','$r') overflows Long; shrink the trainer input")
          ((l, r), c, c * Scale / (symCounts(l) * symCounts(r)))
        }
        // highest scaled score; ties -> smallest chr(1)-joined pair key
        // -- the EXACT string the oracle ORDER BY compares (the \u0001
        // separator removes the prefix ambiguity bare concatenation has)
        val ((l, r), c, sc) = scored.minBy { case ((a, b), _, s) =>
          (-s, a + "\u0001" + b)
        }
        require(r.startsWith("##"),
          s"right symbol '$r' lacks the continuation prefix — a merge " +
            "crossed a word boundary")
        merges += WpMerge(i, l, r, c, sc)
        val (pat, rep) = (s" $l $r ", s" $l${r.drop(2)} ")
        words = words.map { case (s, f) =>
          (s.replace(pat, rep).replace(pat, rep), f)
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Non-empty tokens — [[BpeOps]]'s uniform token rule. */
  private def neTokens(text: Column): Column =
    filter(TextOps.tokens(text), t => length(t) > 0)

  /** A document's WordPiece spaced form: per-word "##"-marked spaced
    * characters, words joined by the " | " boundary symbol. */
  def spacedDoc(text: Column): Column =
    concat(lit(" "),
      array_join(transform(neTokens(text), t =>
        array_join(transform(sequence(lit(1), length(t)), i =>
          when(i === 1, substring(t, i, lit(1)))
            .otherwise(concat(lit("##"), substring(t, i, lit(1))))), " ")),
        " | "),
      lit(" "))

  /** Chain the learned merges over a spaced form: two replace passes
    * per merge in merge order, fused symbol = left + right sans "##". */
  def applyMerges(spaced: Column, merges: Seq[WpMerge]): Column =
    merges.foldLeft(spaced) { (c, m) =>
      val pat = lit(s" ${m.left} ${m.right} ")
      val rep = lit(s" ${m.left}${m.right.drop(2)} ")
      call_function("replace",
        call_function("replace", c, pat, rep), pat, rep)
    }

  /** Per-document tokenization statistics + canonical-form digest —
    * [[BpeOps.tokenizeStats]]'s shape on the WordPiece model, so the
    * two tokenizers' fertility is directly comparable. */
  def tokenizeStats(docs: DataFrame, merges: Seq[WpMerge],
                    text: String = "text"): DataFrame = {
    val s = applyMerges(spacedDoc(col(text)), merges)
    docs.select(col("doc_id"),
      size(neTokens(col(text))).cast("long").as("n_words"),
      aggregate(transform(neTokens(col(text)), t => length(t)),
        lit(0L), (acc, x) => acc + x).as("n_chars"),
      size(filter(split(trim(s), " "), x => x =!= "|" && x =!= ""))
        .cast("long").as("n_wp_tokens"),
      md5(trim(s)).as("tokens_digest"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") /
          nullif(col("n_wp_tokens"), lit(0L)), 6))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("n_wp_tokens"), col("chars_per_token"), col("tokens_digest"))
  }
}
