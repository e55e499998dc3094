package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage: blocked fuzzy matching on string keys.
  *
  * The all-pairs edit-distance join is O(n²) and never survives scale.
  * The standard shape is candidate generation through a BLOCKING KEY
  * (pairs are only compared inside a block) followed by exact
  * verification of the distance predicate — the same
  * candidates-then-verify discipline as the MinHash/LSH and IVF paths
  * (ops/DedupOps.scala, ops/SimilarityOps.scala).
  *
  * Skew control mirrors the shingle index's `maxDf` and the LSH band
  * cap: a block whose membership exceeds `maxBlock` is dropped entirely
  * (documented recall trade), so Σ|block|² — the join's true cost — is
  * bounded by |blocks| · maxBlock².
  */
object LinkageOps {

  /** Canonical fuzzy self-join of a (id, name, block) relation: emits
    * `id_a < id_b` pairs sharing a block key with
    * `levenshtein(name_a, name_b) <= maxDist`.
    */
  def fuzzySelfJoin(rel: DataFrame, maxDist: Int,
                    maxBlock: Int = 1000): DataFrame = {
    val blockSizes = rel.groupBy(col("block"))
      .agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") <= maxBlock)
      .select(col("block"))
    val kept = rel.join(blockSizes, Seq("block"))
    val a = kept.select(col("block"), col("id").as("id_a"),
      col("name").as("name_a"))
    val b = kept.select(col("block"), col("id").as("id_b"),
      col("name").as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** Part-catalog name reconciliation. Names in a catalog repeat —
    * the right scale move is to dedupe to the DISTINCT name vocabulary
    * first (vocabulary grows sublinearly in rows), fuzzy-join the
    * vocabulary, and let consumers map matches back through the name.
    * Block = last whitespace token (the head noun for `adj noun` part
    * names); verify = levenshtein <= maxDist.
    */
  def fuzzyPartNames(part: DataFrame, maxDist: Int = 3,
                     maxBlock: Int = 1000): DataFrame = {
    fuzzySelfJoin(partNameVocab(part), maxDist, maxBlock)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  /** The distinct part-name vocabulary with its blocking key (last
    * whitespace token). */
  def partNameVocab(part: DataFrame): DataFrame =
    part.select(col("p_name").as("name")).distinct()
      .select(col("name"), col("name").as("id"),
        element_at(split(col("name"), "\\s+"), -1).as("block"))

  /** Blocking recall of [[fuzzyPartNames]] vs the exact all-pairs
    * edit-distance screen — the number that tunes the blocking key, the
    * same eval-baseline discipline as `ann_recall_*`. The exact side is
    * an all-pairs join over the DISTINCT NAME VOCABULARY only: bounded
    * by the name-generator's vocabulary (sublinear in corpus rows),
    * never run against the full table.
    *
    * Guarded like [[SimilarityOps.cosineNearDupPairs]]: refuses a
    * vocabulary above `maxExactNames` (the count is one narrow
    * distinct-scan — noise next to the n² join it prevents). Raise the
    * cap explicitly to accept the quadratic cost on purpose. */
  def fuzzyBlockRecall(part: DataFrame, maxDist: Int = 3,
                       maxBlock: Int = 1000,
                       maxExactNames: Long = 100000L): DataFrame = {
    val vocab = partNameVocab(part)
    val nVocab = vocab.count()
    require(nVocab <= maxExactNames,
      s"fuzzyBlockRecall's exact side is an all-pairs O(n²) baseline and " +
        s"the name vocabulary has $nVocab rows (cap $maxExactNames): " +
        "evaluate recall on a sample, or raise maxExactNames deliberately")
    val a = vocab.select(col("name").as("name_a"))
    val b = vocab.select(col("name").as("name_b"))
    val truePairs = a.crossJoin(b)
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .agg(count(lit(1)).as("n_true_pairs"))
    val blockedPairs = fuzzyPartNames(part, maxDist, maxBlock)
      .agg(count(lit(1)).as("n_blocked_pairs"))
    truePairs.crossJoin(blockedPairs)
      .select(col("n_true_pairs"), col("n_blocked_pairs"),
        round(col("n_blocked_pairs").cast("double") /
          nullif(col("n_true_pairs").cast("double"), lit(0d)), 6)
          .as("recall"))
  }
}
