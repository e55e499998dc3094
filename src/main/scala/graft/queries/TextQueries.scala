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
      s"SELECT * FROM ($qualityScoreSql) ORDER BY doc_id"),

    // End-to-end corpus selection: the training-data filter a real
    // pipeline runs — drop near-dup non-representatives (connected-
    // component cluster heads survive), then quality/length gates.
    Q("corpus_select",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val quality = TextOps.qualityScore(docs)
        val clusters = graft.ops.DedupOps.dupClusters(
          graft.ops.DedupOps.ngramJaccardPairs(docs, 3, 0.5))
        quality.join(clusters, Seq("doc_id"), "left")
          .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
          .filter(col("quality_score") >= 0.5 && col("n_tokens") >= 20)
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            col("quality_score"))
          .orderBy("doc_id")
      },
      s"""${OracleFrags.dupClustersWith(3, 0.5)}
         |SELECT q.doc_id, q.lang, q.n_tokens, q.quality_score
         |FROM ($qualityScoreSql) q
         |LEFT JOIN clusters c ON q.doc_id = c.doc_id
         |WHERE (c.cluster_id IS NULL OR c.cluster_id = q.doc_id)
         |AND q.quality_score >= 0.5 AND q.n_tokens >= 20
         |ORDER BY q.doc_id""".stripMargin.replace("\n", " ")),

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
