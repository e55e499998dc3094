package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality operators (the reference's E2 path,
  * /root/reference/data_platform_final.py:96-186).
  *
  * Scale notes: `missingKeys` is a distinct + left-anti join — the distinct
  * shrinks both sides to |keys| before the join, and the reference universe
  * (bhavcopy ≈2k symbols) is broadcastable, so at 100 TB this is a
  * broadcast-anti over a pre-aggregated key set, no big shuffle.
  * `reconcile` joins two aggregates that are both tiny relative to the
  * input (|symbols|×|days| rows).
  */
object QualityOps {

  /** Missing-key check (J2/SO1, `:121,149-153`): keys present in the
    * reference universe but absent from the observed data. Set-minus as a
    * left-anti join on distinct keys. */
  def missingKeys(universe: DataFrame, universeKey: String,
                  observed: DataFrame, observedKey: String): DataFrame = {
    // disambiguate when both sides use the same key name
    val obsKey = if (observedKey == universeKey) s"__obs_$observedKey" else observedKey
    universe.select(col(universeKey)).distinct()
      .join(broadcast(observed.select(col(observedKey).as(obsKey)).distinct()),
        col(universeKey) === col(obsKey), "left_anti")
  }

  /** OHLC reconciliation (A1+J1+P10, `:155-172`): recompute daily bars
    * from ticks and diff against an official/independent OHLC table —
    * the reference's tick-vs-bhavcopy ground-truth check. `official` is
    * small (one row per symbol/day) → broadcast side. */
  def reconcile(derived: DataFrame, official: DataFrame,
                keys: Seq[String]): DataFrame = {
    val d = derived.as("d")
    val o = official.as("o")
    val cond = keys.map(k => col(s"d.$k") === col(s"o.$k")).reduce(_ && _)
    d.join(broadcast(o), cond, "inner")
      .select(
        keys.map(k => col(s"d.$k")) ++ Seq(
          (col("d.open") - col("o.open")).as("open_diff"),
          (col("d.high") - col("o.high")).as("high_diff"),
          (col("d.low") - col("o.low")).as("low_diff"),
          (col("d.close") - col("o.close")).as("close_diff")): _*)
  }

  /** Per-group QC summary: how many rows fail the invalid predicate, per
    * key — the "invalid files report" (`:145-146`) generalized from
    * file-granularity to key-granularity (Spark's unit of work is the
    * partition, not the file; SURVEY.md A5). */
  def invalidSummary(df: DataFrame, checkCols: Seq[String],
                     groupKey: String): DataFrame =
    df.groupBy(col(groupKey))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(TickOps.invalidPredicate(checkCols.map(col)), 1L)
          .otherwise(0L)).as("n_invalid"))
}
