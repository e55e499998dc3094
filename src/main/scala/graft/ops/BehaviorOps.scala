package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
object BehaviorOps {

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
}
