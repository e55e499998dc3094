package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Learned multinomial Naive-Bayes text classifier, trained and applied
  * INSIDE the engine — the model-based stage the curation pipeline runs
  * after heuristics (lang_id, text_quality): fit token likelihoods on a
  * labeled split, score every document, filter by posterior margin
  * (the GPT-3/CCNet-style classifier filter).
  *
  * Everything is aggregates + equality joins, so the 100 TB posture is
  * free: the MODEL is a (vocab × classes)-bounded table (counts +
  * log-likelihoods, class priors are |classes| rows) built by one
  * hash-aggregation over the train split; SCORING explodes documents
  * to (doc, token) rows, drops out-of-vocabulary tokens with an
  * equality join against the vocab (token-sharded, never broadcast —
  * vocab is unbounded), fans out only by |classes| (a broadcast of a
  * few stat rows), and reduces with map-side partial sums. No
  * all-pairs, no driver state beyond nothing — even V and priors stay
  * one-row/|classes|-row frames cross-joined into the plan.
  *
  * Cross-engine determinism: priors round to 9 dp, per-(token, class)
  * Laplace log-likelihoods to 12 dp (see the ll12 note), per-(doc,
  * class) contribution sums run in DECIMAL(30,12), final scores round
  * to 6 dp in decimal space; argmax ties break to the
  * lexicographically smaller class.
  */
object ClassifierOps {

  /** (doc_id, label, token) exploded train tokens. */
  private def explodeTokens(docs: DataFrame, labelCol: String): DataFrame =
    docs.select(col("doc_id"), col(labelCol).as("label"),
      explode(TextOps.tokens(col("text"))).as("token"))

  /** Per-class stats: (label, n_docs, tot_tokens) — |classes| rows. */
  def classStats(train: DataFrame, labelCol: String): DataFrame =
    explodeTokens(train, labelCol)
      .groupBy(col("label"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("tot_tokens"))

  /** Train-vocabulary (token) relation — one hash-agg, vocab-bounded. */
  def vocab(train: DataFrame, labelCol: String): DataFrame =
    explodeTokens(train, labelCol).select(col("token")).distinct()

  /** Per-(token, class) train counts — the model's bulk table. */
  def tokenClassCounts(train: DataFrame, labelCol: String): DataFrame =
    explodeTokens(train, labelCol)
      .groupBy(col("token"), col("label"))
      .agg(count(lit(1)).as("cnt"))

  /** Model summary: (label, n_docs, tot_tokens, vocab_size, prior) with
    * prior = round(ln(n_docs / n_train), 9). */
  def modelStats(train: DataFrame, labelCol: String): DataFrame = {
    val cs = classStats(train, labelCol)
    val nTrain = cs.agg(sum(col("n_docs")).as("n_train"))
    val v = vocab(train, labelCol).agg(count(lit(1)).as("vocab_size"))
    cs.crossJoin(broadcast(nTrain)).crossJoin(broadcast(v))
      .select(col("label"), col("n_docs"), col("tot_tokens"),
        col("vocab_size"),
        round(log(col("n_docs").cast("double") / col("n_train")), 9)
          .as("prior"))
  }

  /** Per-(doc, class) log-posterior scores for `target` docs:
    * prior + Σ_tokens∈vocab count · ll(token, class), with
    * ll = round(ln((cnt+1)/(tot_c+V)), 12) (Laplace smoothing; a vocab
    * token unseen in a class contributes the cnt=0 smoothing mass;
    * out-of-vocabulary tokens are dropped — the standard NB apply).
    * Docs whose tokens are ALL out-of-vocabulary still score (prior
    * only). Output: (doc_id, label_true, label, score). */
  def scores(train: DataFrame, target: DataFrame,
             labelCol: String): DataFrame = {
    val ms = modelStats(train, labelCol)
    val tcc = tokenClassCounts(train, labelCol)
    val dtf = target
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("n"))
      .join(vocab(train, labelCol), Seq("token")) // drop OOV, token-sharded
    val grid = dtf.crossJoin(broadcast(ms))
      .join(tcc, Seq("token", "label"), "left")
    // 12-dp likelihoods (not 9): the score space must be fine enough
    // that (a) an exact 6-dp half boundary is ~1e-6-rare and (b) a
    // 1-ulp libm ln() disagreement between engines can never move the
    // rounded sum across the 6th decimal — at 9 dp one verify row
    // landed exactly on ...5000 where a 1e-9 ln flip decided the
    // rounding.
    val ll12 = round(log(
      (coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
        (col("tot_tokens") + col("vocab_size"))), 12)
    val contribs = grid
      .select(col("doc_id"), col("label"),
        round(col("n") * ll12, 12).as("c"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("c").cast(DecimalType(30, 12))).as("sdec"))
    // prior + Σ is an EXACT 9-dp decimal, so a double-space round-to-6
    // can land exactly on a .5 boundary where the engines' rounding
    // diverges — add and round in DECIMAL space (exact, HALF_UP in
    // both engines), only then cast out to double.
    target.select(col("doc_id"), col(labelCol).as("label_true"))
      .crossJoin(broadcast(ms.select(col("label"), col("prior"))))
      .join(contribs, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label_true"), col("label"),
        round(col("prior").cast(DecimalType(30, 12)) +
          coalesce(col("sdec"), lit(0).cast(DecimalType(30, 12))), 6)
          .cast("double").as("score"))
  }

  /** Argmax prediction per doc (ties → lexicographically smaller
    * class): (doc_id, label_true, pred, score, correct). */
  def classify(train: DataFrame, target: DataFrame,
               labelCol: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("label").asc)
    scores(train, target, labelCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label_true"), col("label").as("pred"),
        col("score"),
        when(col("label") === col("label_true"), lit(1)).otherwise(lit(0))
          .cast("int").as("correct"))
  }

  /** The hand-tuned stopword heuristic (TextOps.langId) binarized to
    * the duel's en-vs-rest task — the third arm of classifier_duel:
    * (classifier='heuristic', n_test, n_correct). */
  def langIdBinaryArm(test: DataFrame, keep: String): DataFrame =
    TextOps.langId(test)
      .agg(count(lit(1)).as("n_test"),
        sum(when((col("pred_lang") === keep) ===
          (col("labeled_lang") === keep), 1L).otherwise(0L))
          .as("n_correct"))
      .select(lit("heuristic").as("classifier"),
        col("n_test").cast("long").as("n_test"),
        col("n_correct").cast("long").as("n_correct"))

  /** Classifier corpus filter for one target class: per doc the margin
    * score(target) − max(score(other)); selected ⇔ margin > 0 — the
    * knob a curation pipeline thresholds. */
  def marginFilter(train: DataFrame, target: DataFrame, labelCol: String,
                   keepClass: String): DataFrame = {
    val sc = scores(train, target, labelCol)
    val tgt = sc.filter(col("label") === keepClass)
      .select(col("doc_id"), col("label_true"), col("score").as("s_target"))
    val other = sc.filter(col("label") =!= keepClass)
      .groupBy(col("doc_id"))
      .agg(max(col("score")).as("s_other"))
    tgt.join(other, Seq("doc_id"))
      .select(col("doc_id"), col("label_true"),
        round(col("s_target") - col("s_other"), 6).as("margin"),
        when(col("s_target") > col("s_other"), lit(1)).otherwise(lit(0))
          .cast("int").as("selected"))
  }
}
