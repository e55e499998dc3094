package graft.ops

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch (whole-split) perceptron — a LINEAR classifier trained INSIDE
  * the engine with EXACT integer arithmetic, the discriminative twin of
  * the generative Naive Bayes next door (ClassifierOps).
  *
  * Model: y ∈ {+1, −1}, features x = hashed token counts over `dim`
  * buckets plus a constant bias feature (x[dim] = 1), weights w ∈ ℤ^{dim+1}.
  * Each epoch updates w += Σ_{i: y_i·(w·x_i) ≤ 0} y_i·x_i — the batch
  * (gradient-summed) perceptron rule with η = 1. Every quantity is an
  * integer, so training is bit-exact, order-independent (the update is a
  * SUM over misclassified rows — no sample-order dependence like the
  * online perceptron), and replayable verbatim by the DuckDB oracle as a
  * recursive CTE over a single-row list state.
  *
  * Scale posture: one feature-build scan (hash-agg to (doc, bucket)
  * counts, assembled to dense vectors — rows stay (corpus)-bounded, the
  * model is dim+1 longs); each epoch is ONE distributed aggregate over
  * the cached feature table (misclassification filter + per-dimension
  * partial sums, (dim+1)-bounded output), with the weight vector shipped
  * as a literal into the plan — the same bounded-driver-state discipline
  * as the IVF centroid family. Epochs are a fixed constant, so total
  * cost is epochs × one scan. At 100 TB nothing changes: no all-pairs,
  * no per-row driver traffic, feature vectors never leave executors.
  *
  * Integer bounds: |w_d| after T epochs ≤ T · Σ_i x_{i,d} ≤ T · N_tokens;
  * |w·x| ≤ (dim+1) · max|w| · max|x| — far inside int64 for any split
  * that fits one engine run (the fixture: T·N ≈ 4·10^5).
  */
object PerceptronOps {

  /** Dense integer feature vectors: (doc_id, y, x) with
    * y = +1 ⇔ label = posClass, x = counts of tokens hashed into `dim`
    * buckets (portable md5/affine-free h31 % dim) plus the bias 1 at
    * x[dim]. One explode + one hash-agg; assembly is a map lookup per
    * dimension — no per-row UDFs, all codegen'd collection functions. */
  def features(docs: DataFrame, labelCol: String, posClass: String,
               dim: Int): DataFrame = {
    val base = docs.select(col("doc_id"),
      when(col(labelCol) === posClass, 1L).otherwise(-1L).as("y"),
      TextOps.tokens(col("text")).as("toks"))
    val bucketCounts = base
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .select(col("doc_id"),
        (Hashing.h31(col("token")) % dim).cast("int").as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val xmap = bucketCounts.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("c"))))
        .as("m"))
    base.select(col("doc_id"), col("y"))
      .join(xmap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        concat(
          transform(sequence(lit(0), lit(dim - 1)),
            i => coalesce(element_at(col("m"), i), lit(0L))),
          array(lit(1L))).as("x"))
  }

  /** Integer dot product of the feature column with a weight literal. */
  private def dotW(w: Array[Long]): org.apache.spark.sql.Column =
    aggregate(zip_with(col("x"), lit(w), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)

  /** One epoch's weight delta under current weights `w`:
    * Σ_{misclassified} y·x per dimension. One filter + posexplode +
    * (dim+1)-bounded hash-agg; the result is the ONLY thing the driver
    * sees (dim+1 rows). */
  private def epochDelta(feats: DataFrame, w: Array[Long]): Array[Long] = {
    val rows = feats
      .filter(col("y") * dotW(w) <= 0)
      .select(col("y"), posexplode(col("x")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(sum(col("y") * col("v")).as("d"))
      .collect()
    val delta = Array.fill(w.length)(0L)
    rows.foreach(r => delta(r.getAs[Int]("pos")) = r.getAs[Long]("d"))
    delta
  }

  /** Batch-perceptron training: `epochs` passes, each one distributed
    * aggregate. Starts from w = 0 (epoch 1 therefore sums ALL rows —
    * y·0 = 0 counts as misclassified, the standard convention). */
  def train(feats: DataFrame, epochs: Int): Array[Long] = {
    val dim = feats.select(size(col("x"))).head().getInt(0)
    var w = Array.fill(dim)(0L)
    (1 to epochs).foreach { _ =>
      val d = epochDelta(feats, w)
      w = w.zip(d).map { case (a, b) => a + b }
    }
    w
  }

  /** Apply trained weights: (doc_id, y, margin, pred, correct) with
    * margin = w·x (exact integer), pred = sign(margin) with the 0 tie
    * to −1 (margin > 0 ⇔ +1 — matches the training rule's "≤ 0 is
    * misclassified" convention). */
  def classify(feats: DataFrame, w: Array[Long]): DataFrame =
    feats
      .select(col("doc_id"), col("y"), dotW(w).as("margin"))
      .select(col("doc_id"), col("y"), col("margin"),
        when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))
      .withColumn("correct",
        when(col("pred") === col("y"), 1).otherwise(0).cast("int"))
}
