package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, BehaviorQueries, CorpusQueries, DedupQueries, ExtraQueries, GraphQueries, LinkageQueries, PipelineQueries, ClassifierQueries, RelationalQueries, RetrievalQueries, SimilarityQueries, SourceQueries, TextQueries, TickQueries, WebQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) registers a [[Q]] in one of the `graft.queries.*` objects;
  * this object just flattens the registry into the driver's shape.
  */
object SparkEntry {

  /** Registry grouped by owning family (the queries object that
    * defines each Q) — provenance for the generated QUERIES.md index
    * and anything else that wants per-family structure. */
  def families: Seq[(String, Seq[Q])] = Seq(
    "TickQueries" -> TickQueries.all,
    "RelationalQueries" -> RelationalQueries.all,
    "TextQueries" -> TextQueries.all,
    "CorpusQueries" -> CorpusQueries.all,
    "DedupQueries" -> DedupQueries.all,
    "RetrievalQueries" -> RetrievalQueries.all,
    "ClassifierQueries" -> ClassifierQueries.all,
    "SimilarityQueries" -> SimilarityQueries.all,
    "PipelineQueries" -> PipelineQueries.all,
    "ExtraQueries" -> ExtraQueries.all,
    "AnalyticsQueries" -> AnalyticsQueries.all,
    "SourceQueries" -> SourceQueries.all,
    "BehaviorQueries" -> BehaviorQueries.all,
    "LinkageQueries" -> LinkageQueries.all,
    "GraphQueries" -> GraphQueries.all,
    "WebQueries" -> WebQueries.all)

  /** All registered capabilities. */
  def registry: Seq[Q] = families.flatMap(_._2)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hourly OHLC bars over the normalized tick stream — the reference's
    * core capability end-to-end (ingest → clean → bar aggregation). */
  def entry(spark: SparkSession): DataFrame =
    ops.TickOps.ohlcBars(
      ops.TickOps.normalizeEvents(
        Tables.events(spark, "/root/testdata/sf0.001")), "1 hour")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
