package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the canonical stateful event-stream
  * operator. Two implementations with one semantics:
  *
  *  - [[sessionize]]: batch, pure window functions (lag → gap flag →
  *    cumulative sum = session id → group). One shuffle on the user key;
  *    SQL-expressible, so it carries the DuckDB oracle.
  *  - [[sessionizeStream]]: Structured Streaming with
  *    `flatMapGroupsWithState` — per-key state carries the open session
  *    across micro-batches, closed sessions are emitted as soon as a gap
  *    proves them closed. The spec asserts its closed sessions equal the
  *    batch result minus each user's final (still-open) session.
  */
object SessionOps {

  /** Batch sessionization: sessions are maximal runs of events per user
    * with inter-event gaps ≤ gap. */
  def sessionize(events: DataFrame, gapMinutes: Int,
                 user: String = "user_id", ts: String = "ts",
                 id: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(user)).orderBy(col(ts).asc, col(id).asc)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("__prev", lag(col(ts), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(ts)) - unix_micros(col("__prev")) > gapUs, 1L)
        .otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(user), col("session_seq"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  final case class Ev(user_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)

  /** Streaming sessionization: emits CLOSED sessions; the open tail per
    * user lives in GroupState across micro-batches.
    *
    * ORDERING ASSUMPTION: events for a user must arrive in event-time
    * order ACROSS micro-batches (within a batch they are sorted here).
    * There is no watermark buffer (NoTimeout), so an earlier-timestamped
    * event landing in a later batch is compared against the open
    * session's last_us and can split/fabricate sessions relative to the
    * batch twin. This holds for the replay fixture (one AvailableNow
    * batch) and for any source that partitions by key and preserves
    * per-key order; for genuinely out-of-order sources, buffer within a
    * watermark and emit on EventTimeTimeout instead. */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(user: Long, batch: Iterator[Ev],
           state: GroupState[OpenSession]): Iterator[Session] = {
      val sorted = batch.toSeq.sortBy(_.ts_us)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        open = open match {
          case None => Some(OpenSession(e.ts_us, e.ts_us, 1))
          case Some(s) if e.ts_us - s.last_us <= gapUs =>
            Some(s.copy(last_us = e.ts_us, n = s.n + 1))
          case Some(s) =>
            closed += Session(user, s.start_us, s.last_us, s.n)
            Some(OpenSession(e.ts_us, e.ts_us, 1))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
  }

  /** Run the streaming sessionizer to completion over a parquet glob and
    * return the closed sessions (memory sink, AvailableNow). */
  def sessionizeStreamAvailableNow(spark: SparkSession, dir: String,
                                   gapMinutes: Int,
                                   queryName: String = "stream_sessions"): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType))))
      .parquet(s"$dir/events.parque*")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
      .as[Ev]
    graft.streaming.StreamingConf.withStatePartitions(spark) {
      val q = sessionizeStream(raw, gapMinutes)
        .writeStream.format("memory").queryName(queryName)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }
}
