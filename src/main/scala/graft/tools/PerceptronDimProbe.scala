package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible probe (round 13): does the zipf duel's perceptron arm
  * recover with a larger hashed-feature budget? Trains the batch
  * perceptron on the zipf corpus at several PDim values and reports
  * held-out accuracy — evidence for (or against) the BASELINE claim
  * that 0.43 at PDim=64 is hashing collision, not a model failure. */
object PerceptronDimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val docs = graft.queries.Staged.zipfDocs(spark, dir)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)
    Seq(64, 256, 1024).foreach { pdim =>
      val feats = graft.ops.PerceptronOps
        .features(train, "lang", "en", pdim).cache()
      val w = graft.ops.PerceptronOps.train(feats, 6)
      val res = graft.ops.PerceptronOps.classify(
          graft.ops.PerceptronOps.features(test, "lang", "en", pdim), w)
        .agg(count(lit(1)).as("n"),
          sum(col("correct").cast("long")).as("ok"))
        .head()
      println(f"[pdim] dim=$pdim acc=${res.getLong(1).toDouble / res.getLong(0)}%.3f")
      feats.unpersist()
    }
    spark.stop()
  }
}
