package graft.queries

import graft.{Q, Tables}
import graft.ops.BehaviorOps
import org.apache.spark.sql.functions._

/** User-behavior analytics over the events stream (ops.BehaviorOps):
  * cohort retention and strictly-ordered funnel conversion — the
  * user-axis extension of the reference's per-instrument rollups.
  */
object BehaviorQueries {

  val all: Seq[Q] = Seq(

    // Cohort retention matrix: users cohorted by first-active day;
    // per (cohort day, day offset) active-user counts and rates. The
    // stream reduces to distinct (user, day) FIRST; cohort and size
    // relations are |users|/|days| rows and broadcast.
    Q("cohort_retention",
      (s, dir) => BehaviorOps.cohortRetention(Tables.events(s, dir))
        .orderBy("cohort_date", "day_offset"),
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date
        |  FROM events),
        |coh AS (SELECT user_id, min(active_date) AS cohort_date
        |  FROM act GROUP BY 1),
        |sizes AS (SELECT cohort_date, count(*) AS n_cohort
        |  FROM coh GROUP BY 1),
        |cells AS (SELECT c.cohort_date,
        |  CAST(date_diff('day', c.cohort_date, a.active_date) AS INT) AS day_offset,
        |  count(*) AS n_active
        |  FROM act a JOIN coh c ON a.user_id = c.user_id GROUP BY 1, 2)
        |SELECT cells.cohort_date, day_offset, n_active, n_cohort,
        |round(n_active::DOUBLE / n_cohort, 6) AS retention
        |FROM cells JOIN sizes ON cells.cohort_date = sizes.cohort_date
        |ORDER BY cells.cohort_date, day_offset"""
        .stripMargin.replace("\n", " ")),

    // Strict funnel view → click → purchase: step i counts users with a
    // step-i event strictly after their step-(i-1) conversion time.
    // One filtered hash-agg per step folded into a SINGLE |users|-keyed
    // lineage (events scanned once per step total, not O(S²)); no
    // window or per-user event collection.
    Q("funnel_conversion",
      (s, dir) => BehaviorOps.funnel(Tables.events(s, dir),
          Seq("view", "click", "purchase"))
        .orderBy("step"),
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |c AS (
        |  SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
        |    count(*) AS n_users FROM s1
        |  UNION ALL SELECT CAST(2 AS INT), 'click', count(*) FROM s2
        |  UNION ALL SELECT CAST(3 AS INT), 'purchase', count(*) FROM s3),
        |b AS (SELECT n_users AS n_base FROM c WHERE step = 1)
        |SELECT step, event_type, n_users,
        |round(n_users::DOUBLE / nullif(n_base::DOUBLE, 0), 6) AS conversion
        |FROM c CROSS JOIN b ORDER BY step"""
        .stripMargin.replace("\n", " ")),

    // §2.9 uplift of the funnel: the same state machine as a
    // flatMapGroupsWithState stream — per-user state is two scalars,
    // conversions append the moment a user advances. Single-batch
    // fixture ⇒ equals the batch funnel exactly (oracle identical);
    // the out-of-order-tolerant variant is spec-proven
    // (StreamingFunnelSpec).
    Q("streaming_funnel",
      (s, dir) => {
        import s.implicits._
        val steps = Seq("view", "click", "purchase")
        val conv = BehaviorOps.funnelStreamAvailableNow(s, dir, steps,
          queryName = "stream_funnel_driver")
        // static step frame left-joined so a step no user reached still
        // reports n_users = 0 — the batch twin's shape (its per-step
        // global aggregates always emit a row)
        val stepDf = steps.zipWithIndex
          .map { case (n, i) => (i + 1, n) }.toDF("step", "event_type")
        val counts = stepDf.join(
            conv.groupBy(col("step")).agg(count(lit(1)).as("n_conv")),
            Seq("step"), "left")
          .select(col("step"), col("event_type"),
            coalesce(col("n_conv"), lit(0L)).as("n_users"))
        val base = counts.filter(col("step") === 1)
          .select(col("n_users").as("n_base"))
        // rate policy (null guard + rounding) is owned by the op —
        // shared with the batch funnel so the two can't drift
        BehaviorOps.conversionRates(counts.crossJoin(broadcast(base)))
          .orderBy("step")
      },
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |c AS (
        |  SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
        |    count(*) AS n_users FROM s1
        |  UNION ALL SELECT CAST(2 AS INT), 'click', count(*) FROM s2
        |  UNION ALL SELECT CAST(3 AS INT), 'purchase', count(*) FROM s3),
        |b AS (SELECT n_users AS n_base FROM c WHERE step = 1)
        |SELECT step, event_type, n_users,
        |round(n_users::DOUBLE / nullif(n_base::DOUBLE, 0), 6) AS conversion
        |FROM c CROSS JOIN b ORDER BY step"""
        .stripMargin.replace("\n", " ")),

    // Audience-overlap from K-minimum-values sketches: day-1 vs day-2
    // active-user sets intersected from two 32-row bottom-k samples
    // (union estimate × sampled Jaccard) next to the exact overlap —
    // the set-operation sketch HLL can't provide, with the md5 hash
    // making both engines build the identical samples. Per-side
    // bottom-k is a partial TakeOrdered (each partition forwards ≤ k
    // rows); everything downstream runs on ≤ 2k rows.
    Q("users_kmv_overlap",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(to_date(col("ts")).as("d"), col("user_id"))
        graft.ops.SketchOps.kmvOverlap(
          ev.filter(col("d") === lit("2024-01-01")),
          ev.filter(col("d") === lit("2024-01-02")),
          "user_id", 32)
      },
      s"""WITH ha AS (SELECT DISTINCT ${graft.functions.Hashing.sqlMd5Long(
             "CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-01'),
         |hb AS (SELECT DISTINCT ${graft.functions.Hashing.sqlMd5Long(
             "CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-02'),
         |ba AS (SELECT hv FROM ha ORDER BY hv LIMIT 32),
         |bb AS (SELECT hv FROM hb ORDER BY hv LIMIT 32),
         |u AS (SELECT DISTINCT hv FROM
         |  (SELECT hv FROM ba UNION ALL SELECT hv FROM bb)
         |  ORDER BY hv LIMIT 32),
         |ka AS (SELECT CASE WHEN count(*) < 32 THEN CAST(count(*) AS DOUBLE)
         |  ELSE round(31.0 * (2.0 ** 60) / max(hv), 6) END AS est_a FROM ba),
         |kb AS (SELECT CASE WHEN count(*) < 32 THEN CAST(count(*) AS DOUBLE)
         |  ELSE round(31.0 * (2.0 ** 60) / max(hv), 6) END AS est_b FROM bb),
         |ku AS (SELECT count(*) AS n_u,
         |  CASE WHEN count(*) < 32 THEN CAST(count(*) AS DOUBLE)
         |  ELSE round(31.0 * (2.0 ** 60) / max(hv), 6) END AS est_union FROM u),
         |x AS (SELECT CAST(count(*) AS BIGINT) AS x_in_both FROM u
         |  WHERE hv IN (SELECT hv FROM ba) AND hv IN (SELECT hv FROM bb)),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_inter FROM
         |  (SELECT DISTINCT user_id FROM events
         |   WHERE CAST(ts AS DATE) = DATE '2024-01-01') a
         |  JOIN (SELECT DISTINCT user_id FROM events
         |   WHERE CAST(ts AS DATE) = DATE '2024-01-02') b USING (user_id)),
         |ea AS (SELECT count(DISTINCT user_id) AS n_a FROM events
         |  WHERE CAST(ts AS DATE) = DATE '2024-01-01'),
         |eb AS (SELECT count(DISTINCT user_id) AS n_b FROM events
         |  WHERE CAST(ts AS DATE) = DATE '2024-01-02')
         |SELECT n_a, n_b, n_inter, est_a, est_b, est_union, x_in_both,
         |round(CAST(x_in_both AS DOUBLE) / n_u, 6) AS jaccard_est,
         |round(round(CAST(x_in_both AS DOUBLE) / n_u, 6) * est_union, 6)
         |  AS est_inter,
         |round(abs(round(round(CAST(x_in_both AS DOUBLE) / n_u, 6)
         |  * est_union, 6) - n_inter)
         |  / nullif(CAST(n_inter AS DOUBLE), 0), 6) AS rel_err
         |FROM ka, kb, ku, x, ex, ea, eb""".stripMargin.replace("\n", " "))
  )
}
