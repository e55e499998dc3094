package graft.queries

import graft.{Q, Tables}
import graft.functions.Hashing
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import OracleFrags._

/** Text-analysis queries over the `documents` fixture (north-star
  * extension surface, SURVEY.md §7 phase 5).
  */
object TextQueries {

  val all: Seq[Q] = Seq(

    // Token counting: whitespace + BPE-ish regex tokenizers.
    Q("token_count",
      (s, dir) => TextOps.tokenCounts(Tables.documents(s, dir))
        .select(col("doc_id"),
          col("n_ws_tokens").cast("long").as("n_ws_tokens"),
          col("n_re_tokens").cast("long").as("n_re_tokens"),
          col("n_chars_measured").cast("long").as("n_chars_measured"))
        .orderBy("doc_id"),
      s"""SELECT doc_id, len($toks) AS n_ws_tokens,
         |len(regexp_extract_all(text, '${TextOps.TokenPattern}')) AS n_re_tokens,
         |CAST(length(text) AS BIGINT) AS n_chars_measured
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")),

    // Language-ID heuristic: function-word scores + argmax CASE chain.
    Q("lang_id",
      (s, dir) => {
        val base = TextOps.langId(Tables.documents(s, dir))
        base.select(
          (col("doc_id") +: col("labeled_lang") +:
            TextOps.StopwordSets.map { case (l, _) =>
              col(s"score_$l").cast("long").as(s"score_$l") } :+
            col("pred_lang")): _*)
          .orderBy("doc_id")
      },
      s"""SELECT doc_id, labeled_lang, ${TextOps.StopwordSets.map { case (l, _) => s"score_$l" }.mkString(", ")},
         |$langCase AS pred_lang FROM (
         |SELECT doc_id, lang AS labeled_lang, $langScores
         |FROM (SELECT doc_id, lang, $toks AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),

    // Quality scoring: length/punctuation/stopword/token-shape signals.
    Q("text_quality",
      (s, dir) => TextOps.qualityScore(Tables.documents(s, dir))
        .orderBy("doc_id"),
      s"""SELECT doc_id, lang,
         |CAST(length(text) AS DOUBLE) AS n_chars_m,
         |CAST(len(toks) AS DOUBLE) AS n_tokens,
         |round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
         |round(${stopwordHits("toks", TextOps.StopwordSets.head._2)} / CAST(len(toks) AS DOUBLE), 6) AS stopword_ratio,
         |round(list_sum(list_transform(toks, t -> CAST(len(t) AS BIGINT))) / CAST(len(toks) AS DOUBLE), 6) AS mean_token_len,
         |round(least(len(toks)::DOUBLE / 100.0, 1.0) * 0.5
         | + round(${stopwordHits("toks", TextOps.StopwordSets.head._2)} / CAST(len(toks) AS DOUBLE), 6) * 0.3
         | + (1.0 - round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / CAST(length(text) AS DOUBLE), 6)) * 0.2, 6) AS quality_score
         |FROM (SELECT doc_id, lang, text, $toks AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),

    // Document fingerprinting: min/max/count over the shingle-hash set.
    Q("doc_fingerprint",
      (s, dir) => TextOps.fingerprints(Tables.documents(s, dir), 3)
        .select(col("doc_id"), col("fp_min"), col("fp_max"),
          col("n_shingles").cast("long").as("n_shingles"))
        .orderBy("doc_id"),
      s"""SELECT doc_id,
         |list_min(list_transform(sh, s -> ${Hashing.sqlMd5Long("s")})) AS fp_min,
         |list_max(list_transform(sh, s -> ${Hashing.sqlMd5Long("s")})) AS fp_max,
         |len(sh) AS n_shingles
         |FROM (SELECT doc_id, ${shingles(toks, 3)} AS sh FROM documents)
         |ORDER BY doc_id""".stripMargin.replace("\n", " "))
  )
}
