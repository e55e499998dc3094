package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Naive-Bayes classifier-family guarantees:
  *
  *  - the model is a proper distribution family: priors exponentiate
  *    to ~1, per-class token mass matches the train split, vocabulary
  *    covers every (token, class) count row;
  *  - scoring is total: every target doc gets exactly |classes| scores
  *    (all-OOV docs fall back to priors) and all scores are negative
  *    log-masses;
  *  - classification is well-formed (one prediction per test doc) and
  *    beats chance on the fixture (the labels carry real signal — the
  *    injected per-language stopwords lang_id keys on);
  *  - the margin filter agrees with argmax: selected ⇔ the target
  *    class strictly wins.
  */
class ClassifierSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
  private def train = docs.filter(col("doc_id") % 5 =!= 0)
  private def test_ = docs.filter(col("doc_id") % 5 === 0)

  test("priors exponentiate to ~1 and class masses match the split") {
    val ms = ops.ClassifierOps.modelStats(train, "lang").collect()
    val probSum = ms.map(r => math.exp(r.getAs[Double]("prior"))).sum
    assert(math.abs(probSum - 1.0) < 1e-6)
    val nTrain = train.count()
    assert(ms.map(_.getAs[Long]("n_docs")).sum == nTrain)
    // one vocab, shared by every class row
    assert(ms.map(_.getAs[Long]("vocab_size")).toSet.size == 1)
  }

  test("scoring is total: |classes| scores per doc, all negative") {
    val nClasses = ops.ClassifierOps.classStats(train, "lang").count()
    val sc = ops.ClassifierOps.scores(train, test_, "lang")
    val perDoc = sc.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) == nClasses))
    assert(perDoc.length.toLong == test_.count())
    assert(sc.filter(col("score") >= 0).count() == 0)
  }

  test("classification: one row per test doc, beats 5-class chance") {
    val cl = SparkEntry.queries("nb_classify")(spark, sf)
    val n = cl.count()
    assert(n == test_.count())
    assert(cl.select("doc_id").distinct().count() == n)
    val acc = cl.agg(sum("correct")).head().getLong(0).toDouble / n
    // 5 roughly balanced language classes → chance ≈ 0.2 (measured:
    // 0.42 at sf0.01, 0.30 at sf0.001 — the margin over chance is the
    // claim, not a point accuracy; fixtures regenerate every round)
    assert(acc >= 0.25, s"held-out accuracy $acc not above chance")
  }

  test("confusion matrix totals equal the test split") {
    val cm = SparkEntry.queries("nb_confusion")(spark, sf)
    assert(cm.agg(sum("n")).head().getLong(0) == test_.count())
  }

  test("margin filter agrees with argmax (selected ⇔ strict 'en' win)") {
    val mf = SparkEntry.queries("corpus_filter_nb")(spark, sf)
      .select("doc_id", "margin", "selected").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    val pred = ops.ClassifierOps.classify(train, docs, "lang")
      .select("doc_id", "pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    mf.foreach { case (id, (margin, sel)) =>
      assert((sel == 1) == (margin > 0))
      if (sel == 1) assert(pred(id) == "en")
      // strict loss ⇒ not predicted en; margin == 0 ties go to argmax's
      // lexicographic rule, so only the strict case is asserted
      if (margin < 0) assert(pred(id) != "en")
    }
    assert(mf.nonEmpty)
  }
}
