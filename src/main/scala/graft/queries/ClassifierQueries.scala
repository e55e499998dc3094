package graft.queries

import graft.{Q, Tables}
import graft.ops.ClassifierOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import OracleFrags._

/** Learned classifier stage of the curation pipeline: multinomial
  * Naive Bayes fit on a deterministic labeled split (language labels —
  * the signal the heuristic lang_id chases with hand-tuned stopword
  * lists), applied to held-out documents, and used as a margin-
  * thresholded corpus FILTER (the GPT-3/CCNet-style "does this look
  * like the target distribution" selector).
  *
  * Split convention: train = doc_id % 5 ≠ 0, test = doc_id % 5 = 0 —
  * deterministic, label-independent, scale-stable.
  */
object ClassifierQueries {

  private final val KeepClass = "en"

  private def train(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") % 5 =!= 0)

  private def test(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)

  // ── oracle fragments (mirror ClassifierOps step by step) ──────────

  private val trainRel = "SELECT * FROM documents WHERE doc_id % 5 <> 0"
  private val testRel = "SELECT * FROM documents WHERE doc_id % 5 = 0"

  /** Model CTE chain: `ttoks, cstats, ntr, vcb, vsz, ms, tcc`. */
  private val modelWith: String =
    s"""ttoks AS (SELECT doc_id, lang AS label, unnest($toks) AS token
       |  FROM ($trainRel)),
       |cstats AS (SELECT label, count(DISTINCT doc_id) AS n_docs,
       |  count(*) AS tot_tokens FROM ttoks GROUP BY label),
       |ntr AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_train FROM cstats),
       |vcb AS (SELECT DISTINCT token FROM ttoks),
       |vsz AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM vcb),
       |ms AS (SELECT label, n_docs, tot_tokens, vocab_size,
       |  round(ln(CAST(n_docs AS DOUBLE) / n_train), 9) AS prior
       |  FROM cstats CROSS JOIN ntr CROSS JOIN vsz),
       |tcc AS (SELECT token, label, count(*) AS cnt
       |  FROM ttoks GROUP BY 1, 2)""".stripMargin.replace("\n", " ")

  /** Score CTE chain over a target relation: appends `dvf, grid,
    * contribs, scorerel(doc_id, label_true, label, score)`. The final
    * prior+Σ add and round-to-6 run in DECIMAL space at 12-dp scale —
    * the sum is an exact decimal, and double-space rounding of an
    * exact decimal can land on a .5 boundary where the engines
    * diverge (see the ClassifierOps ll12 note). */
  private def scoreWith(targetRel: String): String =
    s"""$modelWith,
       |dvf AS (
       |  SELECT d.doc_id, d.token, d.n FROM (
       |    SELECT doc_id, token, count(*) AS n FROM
       |      (SELECT doc_id, unnest($toks) AS token FROM ($targetRel))
       |    GROUP BY 1, 2) d
       |  JOIN vcb ON d.token = vcb.token),
       |grid AS (
       |  SELECT doc_id, ms.label,
       |  round(n * round(ln(CAST(COALESCE(cnt, 0) + 1 AS DOUBLE) /
       |    (tot_tokens + vocab_size)), 12), 12) AS c
       |  FROM dvf CROSS JOIN ms
       |  LEFT JOIN tcc ON dvf.token = tcc.token AND ms.label = tcc.label),
       |contribs AS (SELECT doc_id, label,
       |  SUM(CAST(c AS DECIMAL(30,12))) AS sdec FROM grid GROUP BY 1, 2),
       |scorerel AS (
       |  SELECT t.doc_id, t.lang AS label_true, m.label,
       |  CAST(round(CAST(m.prior AS DECIMAL(30,12)) +
       |    COALESCE(c.sdec, CAST(0 AS DECIMAL(30,12))), 6) AS DOUBLE)
       |    AS score
       |  FROM ($targetRel) t CROSS JOIN ms m
       |  LEFT JOIN contribs c
       |  ON t.doc_id = c.doc_id AND m.label = c.label)"""
      .stripMargin.replace("\n", " ")

  /** Argmax prediction relation `predrel` over `scorerel`. */
  private val predWith: String =
    s"""predrel AS (
       |  SELECT doc_id, label_true, label AS pred, score,
       |  CAST(CASE WHEN label = label_true THEN 1 ELSE 0 END AS INT)
       |    AS correct
       |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, label ASC) AS rn FROM scorerel)
       |  WHERE rn = 1)""".stripMargin.replace("\n", " ")

  // ── registered queries ────────────────────────────────────────────

  val all: Seq[Q] = Seq(

    // The fitted model's summary table: class priors + the count mass
    // the likelihoods divide by — the artifact a pipeline persists
    // after the (one hash-agg) training pass.
    Q("nb_model_stats",
      (s, dir) => ClassifierOps.modelStats(train(s, dir), "lang")
        .select(col("label"), col("n_docs").cast("long").as("n_docs"),
          col("tot_tokens").cast("long").as("tot_tokens"),
          col("vocab_size").cast("long").as("vocab_size"), col("prior"))
        .orderBy("label"),
      s"""WITH $modelWith
         |SELECT label, CAST(n_docs AS BIGINT) AS n_docs,
         |CAST(tot_tokens AS BIGINT) AS tot_tokens, vocab_size, prior
         |FROM ms ORDER BY label""".stripMargin.replace("\n", " ")),

    // Held-out classification: argmax class per test doc with its
    // log-posterior score and a correctness flag (the learned twin of
    // the heuristic lang_id). Measured at sf0.01: 42/100 held-out —
    // matches the hand-tuned stopword heuristic (lang_id: 41/100 on
    // the same split) WITHOUT being told which tokens carry language
    // signal; the fixture ceiling is low because ~85% of every doc is
    // shared database jargon. The confusion matrix (nb_confusion)
    // shows the residual en-prior bias honestly.
    Q("nb_classify",
      (s, dir) => ClassifierOps.classify(train(s, dir), test(s, dir), "lang")
        .orderBy("doc_id"),
      s"""WITH ${scoreWith(testRel)}, $predWith
         |SELECT doc_id, label_true, pred, score, correct
         |FROM predrel ORDER BY doc_id""".stripMargin.replace("\n", " ")),

    // Confusion matrix over the held-out split — the eval artifact
    // that justifies (or indicts) using the classifier as a filter.
    Q("nb_confusion",
      (s, dir) => ClassifierOps.classify(train(s, dir), test(s, dir), "lang")
        .groupBy(col("label_true"), col("pred"))
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("label_true", "pred"),
      s"""WITH ${scoreWith(testRel)}, $predWith
         |SELECT label_true, pred, CAST(count(*) AS BIGINT) AS n
         |FROM predrel GROUP BY 1, 2
         |ORDER BY label_true, pred""".stripMargin.replace("\n", " ")),

    // The classifier applied IN FLIGHT with the FROZEN model (fit once
    // on the standing train split — how production curation deploys a
    // filter): each document micro-batch scores against the same model
    // tables through the replay-safe batch_id-keyed sink. Scoring is
    // per-DOC pure (aggregations never cross documents), so any
    // micro-batch slicing yields the same rows and the batch oracle
    // over the full corpus applies verbatim.
    Q("streaming_classify",
      (s, dir) => {
        val work = graft.util.Fs.workDir("graft_stream_nb", dir).toString
        graft.util.Fs.deleteRec(work)
        graft.streaming.StreamingDocApply.applyAvailableNow(s, dir, work,
            b => ClassifierOps.classify(train(s, dir), b, "lang"))
          .orderBy("doc_id")
      },
      s"""WITH ${scoreWith("SELECT * FROM documents")}, $predWith
         |SELECT doc_id, label_true, pred, score, correct
         |FROM predrel ORDER BY doc_id""".stripMargin.replace("\n", " ")),

    // Classifier-based corpus filter: margin of the target class over
    // the best alternative for EVERY document (train docs included —
    // a production filter scores the whole corpus); selected ⇔ the
    // classifier prefers the target class. Thresholding `margin`
    // is the curation knob (GPT-3's quality-filter shape).
    Q("corpus_filter_nb",
      (s, dir) => ClassifierOps.marginFilter(
          train(s, dir), Tables.documents(s, dir), "lang", KeepClass)
        .orderBy("doc_id"),
      s"""WITH ${scoreWith("SELECT * FROM documents")}
         |SELECT t.doc_id, t.label_true,
         |round(t.score - o.s_other, 6) AS margin,
         |CAST(CASE WHEN t.score > o.s_other THEN 1 ELSE 0 END AS INT)
         |  AS selected
         |FROM (SELECT doc_id, label_true, score FROM scorerel
         |      WHERE label = '$KeepClass') t
         |JOIN (SELECT doc_id, max(score) AS s_other FROM scorerel
         |      WHERE label <> '$KeepClass' GROUP BY doc_id) o
         |ON t.doc_id = o.doc_id
         |ORDER BY t.doc_id""".stripMargin.replace("\n", " ")))
}
