package graft.queries

import graft.{Q, Tables}
import graft.functions.Hashing
import graft.ops.MultimodalOps
import graft.pipeline.Pipeline
import graft.streaming.StreamingOhlc
import org.apache.spark.sql.functions._
import OracleFrags.toks

/** Multimodal, streaming, end-to-end pipeline, and window-ranking
  * queries — the remaining SURVEY.md §2 / north-star surface.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    // Multimodal decode: binary payload → typed metadata via a
    // partition-batched typed Dataset (decode stub is md5-deterministic,
    // so the oracle reproduces it from the source text).
    Q("multimodal_decode",
      (s, dir) => MultimodalOps.decodeMedia(
          MultimodalOps.asMediaTable(Tables.documents(s, dir)))
        .toDF().orderBy("media_id"),
      s"""SELECT doc_id AS media_id,
         |CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS media_type,
         |CAST(length(text) AS BIGINT) AS n_bytes,
         |h % 640 + 1 AS width,
         |(h // 640) % 480 + 1 AS height,
         |CASE WHEN doc_id % 2 = 0 THEN 1
         |  ELSE CAST(length(text) // 10 AS BIGINT) END AS n_frames
         |FROM (SELECT doc_id, text, ${OracleFrags.h31("text")} AS h FROM documents)
         |ORDER BY media_id""".stripMargin.replace("\n", " ")),

    // Frame sampling: binary chunking with digest-typed array output.
    Q("multimodal_frames",
      (s, dir) => MultimodalOps.sampleFrames(
          MultimodalOps.asMediaTable(Tables.documents(s, dir)), 16)
        .orderBy("media_id"),
      """SELECT doc_id AS media_id,
        |CAST(length(text) AS BIGINT) AS n_bytes,
        |list_transform(range(1, CAST(length(text) // 16 AS INT) + 1),
        |  i -> md5(substr(text, (i - 1) * 16 + 1, 16))) AS frame_digests
        |FROM documents ORDER BY media_id""".stripMargin.replace("\n", " ")),

    // Structured-Streaming twin of ohlc_hourly (AvailableNow over the
    // same fixtures — identical result, incremental execution).
    Q("streaming_ohlc_hourly",
      (s, dir) => StreamingOhlc.hourlyOhlcAvailableNow(s, dir)
        .orderBy("bar_start", "symbol"),
      TickQueries.hourlyOracleSql),

    // Whole-pipeline E2E: ingest → partitioned warehouse → CSV round-trip
    // → QC reports → analytics MV; one row of per-stage counts.
    Q("pipeline_e2e",
      (s, dir) => {
        val work = s"${System.getProperty("java.io.tmpdir")}/graft_pipeline"
        Pipeline.runDailyAsDf(s, dir, work)
      },
      s"""SELECT
         |(SELECT count(*) FROM events) AS warehouseRows,
         |(SELECT least(count(*), 1000) FROM events) AS csvRoundtripRows,
         |CAST(0 AS BIGINT) AS invalidRows,
         |CAST(1 AS BIGINT) AS missingSymbols,
         |(SELECT count(*) FROM (SELECT DISTINCT CAST(ts AS DATE), event_type FROM events)) AS reconcileRows,
         |(SELECT count(*) FROM (SELECT DISTINCT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000), event_type FROM events)) AS hourlyBars,
         |(SELECT count(DISTINCT CAST(ts AS DATE)) FROM events) AS partitions"""
        .stripMargin.replace("\n", " ")),

    // Ranking-window family (row_number/rank/dense_rank + ntile).
    Q("rank_events",
      (s, dir) => {
        val t = graft.ops.TickOps.normalizeEvents(Tables.events(s, dir))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("symbol")).orderBy(col("price").desc, col("event_id").asc)
        t.select(col("symbol"), col("event_id"), col("price"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .filter(col("rn") <= 5)
          .orderBy("symbol", "rn")
      },
      s"""SELECT symbol, event_id, price,
         |CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk,
         |CAST(drnk AS INT) AS drnk, CAST(quartile AS INT) AS quartile
         |FROM (
         |  SELECT replace(event_type, '.NSE', '') AS symbol, event_id,
         |  CAST(value AS DOUBLE) AS price,
         |  row_number() OVER w AS rn, rank() OVER w AS rnk,
         |  dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
         |  FROM events
         |  WINDOW w AS (PARTITION BY replace(event_type, '.NSE', '')
         |    ORDER BY CAST(value AS DOUBLE) DESC, event_id ASC))
         |WHERE rn <= 5 ORDER BY symbol, rn""".stripMargin.replace("\n", " "))
  )
}
