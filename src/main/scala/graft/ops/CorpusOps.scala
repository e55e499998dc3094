package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators between "filtered corpus" and "training
  * shards": benchmark decontamination, concat-and-chunk packing, and
  * within-document repetition profiling. All narrow maps or
  * equality-keyed joins/aggs — no all-pairs work, no driver loops.
  */
object CorpusOps {

  /** N-gram benchmark-decontamination report (GPT-3 appendix C shape).
    *
    * `index` is a (doc_id, sh_h) inverted shingle index over ALL docs
    * (benchmark + candidate training set, e.g. DedupOps.docShingleHashes
    * or the session-staged copy); `sizes` is (doc_id, n_sh). Rows where
    * `isBench` holds form the held-out eval set; every other doc is
    * scored by how many of its distinct shingles appear anywhere in the
    * benchmark. The benchmark side is distinct-ed and broadcast — at
    * 100 TB the corpus side streams partition-local through the hash
    * join (benchmarks are MBs), and the per-doc count is one hash-agg on
    * the natural doc_id key.
    */
  def decontaminate(index: DataFrame, sizes: DataFrame,
                    isBench: Column): DataFrame = {
    val bench = index.filter(isBench).select("sh_h").distinct()
    val hits = index.filter(!isBench)
      .join(broadcast(bench), "sh_h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    sizes.filter(!isBench)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_sh") === 0, lit(0.0))
          .otherwise(round(
            coalesce(col("n_hits"), lit(0L)) / col("n_sh").cast("double"),
            6)).as("contamination"))
  }

  /** Concat-and-chunk spans: documents concatenated per (lang, source)
    * shard in doc_id order and cut every `chunkTokens` tokens. One
    * window pass per shard (shards are independent partitions — the
    * property that makes the pass distributed at scale; no global
    * order). Emits each doc's [start_chunk, end_chunk] span. */
  def chunkSpans(docs: DataFrame, chunkTokens: Long): DataFrame = {
    val t = docs.select(
      col("doc_id"), col("lang"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $chunkTokens").as("start_chunk"),
        expr(s"(cum - 1) div $chunkTokens").as("end_chunk"),
        expr(s"(cum - 1) div $chunkTokens - (cum - n_tokens) div $chunkTokens + 1")
          .as("n_chunks"))
  }

  /** Epoch-weighted corpus expansion — the deterministic form of
    * quality-weighted sampling used when mixing a training set: a doc
    * with quality score q is repeated `floor(4q) + 1` times (1–5
    * epochs), and each (doc, epoch) copy lands in a shard chosen by an
    * engine-portable hash, so higher-quality text is over-represented
    * in the mixed output without any RNG (both engines derive the same
    * expansion). `quality` must carry (doc_id, lang, quality_score)
    * with quality_score already cross-engine deterministic (it is —
    * TextOps.qualityScore rounds to 6 dp). A narrow explode: no
    * shuffle, output size bounded by 5× input; at 100 TB the expansion
    * streams partition-local into the shard writer. */
  def epochExpansion(quality: DataFrame, nShards: Int): DataFrame = {
    val withEpochs = quality.select(
      col("doc_id"), col("lang"), col("quality_score"),
      (floor(col("quality_score") * 4) + 1).cast("int").as("n_epochs"))
    withEpochs
      .select(col("doc_id"), col("lang"), col("quality_score"),
        col("n_epochs"),
        explode(expr("sequence(1, n_epochs)")).as("epoch_idx"))
      .withColumn("shard",
        (graft.functions.Hashing.md5Long(
          concat(col("doc_id").cast("string"), lit(":"),
            col("epoch_idx").cast("string"))) % nShards).cast("int"))
  }

  /** Per-doc word-bigram frequency profile (the Gopher/MassiveText
    * repetition signal): total/distinct bigram counts, the top bigram's
    * share, distinct/total ratio. Bigrams are NOT distinct-ed —
    * repetition is the point. Docs with fewer than two tokens have no
    * bigram and are omitted. */
  def bigramProfile(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    t.select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        max(col("cnt")).as("max_count"))
      .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
        col("max_count"),
        round(col("max_count").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"),
        round(col("n_distinct").cast("double") / col("n_bigrams"), 6)
          .as("distinct_frac"))
  }
}
