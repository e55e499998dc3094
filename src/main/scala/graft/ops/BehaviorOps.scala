package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** User-behavior analytics over the event stream: cohort retention and
  * ordered funnel conversion.
  *
  * The reference pipeline stops at per-instrument aggregates
  * (data_platform_final.py:319-344 hourly/daily rollups); these are the
  * user-axis twins a product/data team runs on the same events. Both are
  * built to scale on the user dimension:
  *
  *  - Retention reduces the stream to distinct (user, day) activity
  *    first — the widest shuffle is |users| × |days|, orders of magnitude
  *    below |events| — then joins the per-user cohort date, a relation of
  *    |users| rows that stays broadcast-sized into the billions.
  *  - The funnel computes one hash-aggregate per step over a filtered
  *    slice of the stream; each step's per-user timestamp relation is
  *    |users| rows, broadcast back for the strict-ordering filter. No
  *    window over the full stream, no event-list collection per user.
  */
object BehaviorOps extends Serializable {

  /** Cohort retention matrix. Users are cohorted by the calendar day of
    * their first event; for every (cohort day, day offset) cell we report
    * how many of the cohort's users were active that day and the
    * retention rate vs the cohort size at offset 0.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("active_date"))
      .distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("active_date")).as("cohort_date"))
    val sizes = cohorts.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("n_cohort"))
    activity.join(broadcast(cohorts), Seq("user_id"))
      .groupBy(col("cohort_date"),
        datediff(col("active_date"), col("cohort_date")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_date"))
      .select(col("cohort_date"), col("day_offset"), col("n_active"),
        col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
  }

  /** Strictly-ordered funnel conversion. `steps` is the ordered list of
    * event types; a user converts through step i only with an event of
    * that type STRICTLY AFTER their step i-1 conversion time (earliest
    * such event wins). Returns one row per step with the converted user
    * count and the rate vs step 1.
    *
    * Each step is one filtered hash-aggregate producing a |users|-row
    * relation that is broadcast into the next step's filter — the
    * event stream is scanned once per step and never windowed or
    * collected per user.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"), col("ts"), col("event_type"))
    // per-step per-user conversion times, built left to right
    val stepTimes: Seq[DataFrame] = steps.zipWithIndex
      .foldLeft(List.empty[DataFrame]) { case (acc, (step, i)) =>
        val slice = e.filter(col("event_type") === step)
        val t = acc match {
          case Nil =>
            slice.groupBy(col("user_id")).agg(min(col("ts")).as("conv_ts"))
          case prev :: _ =>
            slice.join(broadcast(prev.select(col("user_id"),
                col("conv_ts").as("prev_ts"))), Seq("user_id"))
              .filter(col("ts") > col("prev_ts"))
              .groupBy(col("user_id")).agg(min(col("ts")).as("conv_ts"))
        }
        t :: acc
      }.reverse
    val counts = steps.zip(stepTimes).zipWithIndex.map {
      case ((step, t), i) =>
        t.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(step).as("event_type"),
            col("n_users"))
    }
    val all = counts.reduce(_ unionByName _)
    val base = all.filter(col("step") === 1)
      .select(col("n_users").as("n_base"))
    all.crossJoin(broadcast(base))
      .select(col("step"), col("event_type"), col("n_users"),
        round(col("n_users").cast("double") /
          nullif(col("n_base").cast("double"), lit(0d)), 6)
          .as("conversion"))
  }

  /** One emitted funnel advance: `user_id` reached `step` at `conv_us`. */
  final case class StepConv(user_id: Long, step: Int, conv_us: Long)

  /** Per-user machine state: next step index awaited + the previous
    * step's conversion time (MinValue before step 1 — the uniform
    * strict-after guard). */
  final case class FunnelSt(step: Int, last_us: Long)

  /** Watermark-buffered state: machine position + not-yet-settled
    * events (ts_us, stepIdx). */
  final case class FunnelBuf(step: Int, last_us: Long,
                             pending: Seq[(Long, Int)])

  private def advance(userId: Long, st: FunnelSt, nSteps: Int,
                      evs: Seq[(Long, Int)],
                      out: collection.mutable.Builder[StepConv, Seq[StepConv]]): FunnelSt = {
    var s = st
    evs.foreach { case (ts, idx) =>
      if (s.step < nSteps && idx == s.step && ts > s.last_us) {
        s = FunnelSt(s.step + 1, ts)
        out += StepConv(userId, s.step, ts)
      }
    }
    s
  }

  /** Streaming funnel: the [[funnel]] state machine per user in
    * `flatMapGroupsWithState` — a conversion row is emitted the moment a
    * user advances a step. Identical semantics to the batch form
    * (earliest event strictly after the previous step's conversion
    * wins): greedily advancing over events in event-time order IS the
    * batch min-chain, and the strict-inequality guard makes same-ts ties
    * order-insensitive.
    *
    * ORDERING ASSUMPTION (same contract as
    * [[SessionOps.sessionizeStream]]): per-user event-time order must
    * hold ACROSS micro-batches (within a batch events are sorted here);
    * for genuinely out-of-order sources use
    * [[funnelStreamWatermarked]]. Per-user state is two scalars —
    * bounded regardless of stream length.
    *
    * `events` carries (user_id, ts_us, step_idx), pre-mapped so only
    * funnel-relevant events reach the state machine. */
  def funnelStream(events: Dataset[(Long, Long, Int)],
                   nSteps: Int): Dataset[StepConv] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fn(userId: Long, batch: Iterator[(Long, Long, Int)],
           state: GroupState[FunnelSt]): Iterator[StepConv] = {
      val st = state.getOption.getOrElse(FunnelSt(0, Long.MinValue))
      val out = Seq.newBuilder[StepConv]
      val next = advance(userId, st, nSteps,
        batch.map(e => (e._2, e._3)).toSeq.sortBy(_._1), out)
      // state persists even when fully converted: dropping it would let
      // a later batch re-run the machine from step 0 and re-emit
      state.update(next)
      out.result().iterator
    }
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fn)
  }

  /** Out-of-order-tolerant streaming funnel: events buffer in state
    * until the watermark proves nothing earlier can still arrive, then
    * fold through the machine in event-time order — cross-batch
    * disorder within the delay cannot reorder conversions (the same
    * buffer-and-settle skeleton as
    * [[SessionOps.sessionizeStreamWatermarked]]). Events later than the
    * watermark allows are dropped, matching watermarked-aggregation
    * policy. Per-user state is the two machine scalars plus the pending
    * buffer, which drains on every watermark advance — bounded by
    * arrival rate × delay.
    *
    * `events` carries (user_id, ts_us, step_idx, event_ts); the
    * timestamp column must already carry the stream's watermark. */
  def funnelStreamWatermarked(events: Dataset[(Long, Long, Int, java.sql.Timestamp)],
                              nSteps: Int): Dataset[StepConv] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fn(userId: Long, batch: Iterator[(Long, Long, Int, java.sql.Timestamp)],
           state: GroupState[FunnelBuf]): Iterator[StepConv] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(FunnelBuf(0, Long.MinValue, Nil))
      val incoming = batch.map(e => (e._2, e._3)).filter(_._1 >= wmUs).toSeq
      val (settled, pending) =
        (st.pending ++ incoming).sortBy(_._1).partition(_._1 <= wmUs)
      val out = Seq.newBuilder[StepConv]
      val next = advance(userId, FunnelSt(st.step, st.last_us), nSteps,
        settled, out)
      if (pending.isEmpty && next.step == nSteps) state.remove()
      else {
        state.update(FunnelBuf(next.step, next.last_us, pending))
        pending.headOption.foreach { case (firstUs, _) =>
          state.setTimeoutTimestamp(
            math.max(state.getCurrentWatermarkMs() + 1, firstUs / 1000L + 1))
        }
      }
      out.result().iterator
    }
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Map raw events to the funnel-stream input: only `steps` types
    * survive, as (user_id, ts_us, step_idx). Shared by the streaming
    * entry points and specs so the mapping can't drift. */
  def toStepEvents(events: DataFrame, steps: Seq[String]): DataFrame = {
    val idx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(acc) }
    events
      .withColumn("step_idx", idx)
      .filter(col("step_idx") >= 0)
  }

  /** Run the in-order streaming funnel to completion over the events
    * parquet (AvailableNow, memory sink) and return the conversion rows. */
  def funnelStreamAvailableNow(spark: org.apache.spark.sql.SparkSession,
                               dir: String, steps: Seq[String],
                               queryName: String = "stream_funnel"): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType))))
      .parquet(s"$dir/events.parque*")
    val stepEvents = toStepEvents(raw, steps)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("step_idx"))
      .as[(Long, Long, Int)]
    graft.streaming.StreamingConf.withStatePartitions(spark) {
      val q = funnelStream(stepEvents, steps.length)
        .writeStream.format("memory").queryName(queryName)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(queryName)
  }
}
