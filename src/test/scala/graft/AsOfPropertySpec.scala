package graft

import graft.ops.AsOfOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the custom merge exec (`asofJoinNative`) must agree
  * with the declarative union-window form AND a reference in-memory
  * implementation on arbitrary data — duplicate timestamps, probe-before-
  * any-tick, keys on only one side. (Generators driven with fixed seeds;
  * the scalatest-scalacheck bridge isn't in the offline dependency set.)
  */
class AsOfPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val baseUs = 1700000000000000L

  private val keyGen = Gen.oneOf("A", "B", "C", "D")
  private val tsGen = Gen.choose(0L, 50L).map(s => baseUs + s * 1000000L)
  private val tickGen = for {
    k <- keyGen; t <- tsGen; v <- Gen.choose(1, 999)
  } yield (k, t, v.toDouble)
  private val probeGen = for { k <- keyGen; t <- tsGen } yield (k, t)

  /** Reference semantics, in-memory: the latest tick at-or-before each
    * probe, per key; among ticks sharing the latest timestamp the
    * GREATEST value wins (graft's documented deterministic tie-break —
    * both the window form's third sort key and the exec's required tick
    * ordering encode it). */
  private def refAsof(ticks: Seq[(String, Long, Double)],
                      probes: Seq[(String, Long)]): Set[(String, Long, Double, Long)] =
    probes.distinct.flatMap { case (k, pt) =>
      val cands = ticks.filter(t => t._1 == k && t._2 <= pt)
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(t => (t._2, t._3))
        Some((k, pt, best._3, best._2))
      }
    }.toSet

  test("property: native as-of exec matches reference semantics on random data") {
    (1L to 12L).foreach { seed =>
      // 60 ticks over 4 keys × 51 timestamps: duplicate (key, ts) pairs
      // with DIFFERENT values occur naturally — the tie-break is under
      // test, not sidestepped by dedup
      val ticks = sample(Gen.listOfN(60, tickGen), seed)
      val probes = sample(Gen.listOfN(30, probeGen), seed + 1000)
      val tdf = ticks.toDF("symbol", "us", "price")
        .selectExpr("symbol", "timestamp_micros(us) AS event_ts", "price")
      val pdf = probes.distinct.toDF("symbol", "us")
        .selectExpr("symbol", "timestamp_micros(us) AS event_ts")
      def run(df: org.apache.spark.sql.DataFrame) = df
        .selectExpr("symbol", "unix_micros(event_ts)", "asof_value",
          "unix_micros(asof_ts)")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      val native = run(
        AsOfOps.asofJoinNative(tdf, pdf, "symbol", "event_ts", "price"))
      val composed = run(
        AsOfOps.asofJoin(tdf, pdf, "symbol", "event_ts", "price"))
      val expected = refAsof(ticks, probes)
      assert(native == expected, s"native diverged at seed $seed")
      assert(composed == expected, s"composed diverged at seed $seed")
    }
  }

  /** Forward reference semantics: the EARLIEST tick at-or-after each
    * probe, per key; equal-earliest-ts ties break to the GREATEST value
    * (same direction-independent tie-break as the backward join). */
  private def refAsofForward(ticks: Seq[(String, Long, Double)],
                             probes: Seq[(String, Long)]): Set[(String, Long, Double, Long)] =
    probes.distinct.flatMap { case (k, pt) =>
      val cands = ticks.filter(t => t._1 == k && t._2 >= pt)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(t => (t._2, -t._3))
        Some((k, pt, best._3, best._2))
      }
    }.toSet

  test("property: forward as-of matches reference semantics on random data") {
    (1L to 12L).foreach { seed =>
      val ticks = sample(Gen.listOfN(60, tickGen), seed + 5000)
      val probes = sample(Gen.listOfN(30, probeGen), seed + 6000)
      val tdf = ticks.toDF("symbol", "us", "price")
        .selectExpr("symbol", "timestamp_micros(us) AS event_ts", "price")
      val pdf = probes.distinct.toDF("symbol", "us")
        .selectExpr("symbol", "timestamp_micros(us) AS event_ts")
      val got = AsOfOps
        .asofJoinForward(tdf, pdf, "symbol", "event_ts", "price")
        .selectExpr("symbol", "unix_micros(event_ts)", "asof_value",
          "unix_micros(asof_ts)")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(got == refAsofForward(ticks, probes),
        s"forward diverged at seed $seed")
    }
  }

  test("null keys/timestamps/values are dropped identically by both forms") {
    // nulls on every column that participates in the merge: a null-key
    // tick and probe, a null-ts tick and probe, and a null-VALUE tick
    // sitting between two valid ticks (the probe must fall through to
    // the latest non-null observation, not match the null one).
    val ticks = Seq(
      (Some("A"), Some(10L), Some(1.0)),
      (Some("A"), Some(20L), None: Option[Double]), // null value: skipped
      (None: Option[String], Some(15L), Some(99.0)), // null key
      (Some("A"), None: Option[Long], Some(98.0)), // null ts
      (Some("B"), Some(5L), Some(7.0)))
    val probes = Seq(
      (Some("A"), Some(25L)), // sees 1.0@10 (null-value tick skipped)
      (None: Option[String], Some(25L)), // null key: dropped
      (Some("B"), None: Option[Long]), // null ts: dropped
      (Some("B"), Some(4L))) // before any B tick: inner drop
    val tdf = ticks.toDF("symbol", "s", "price")
      .selectExpr("symbol", "timestamp_micros(s * 1000000) AS event_ts", "price")
    val pdf = probes.toDF("symbol", "s")
      .selectExpr("symbol", "timestamp_micros(s * 1000000) AS event_ts")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("symbol", "unix_micros(event_ts) / 1000000", "asof_value",
        "unix_micros(asof_ts) / 1000000")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val native = run(
      AsOfOps.asofJoinNative(tdf, pdf, "symbol", "event_ts", "price"))
    val composed = run(
      AsOfOps.asofJoin(tdf, pdf, "symbol", "event_ts", "price"))
    val expected = Set(("A", 25.0, 1.0, 10.0))
    assert(native == expected)
    assert(composed == expected)
  }

  test("a directly constructed AsOfJoinNode tolerates null rows (exec-level guard)") {
    // bypass AsOfOps' null pre-filters entirely: build the node straight
    // from analyzed plans containing null keys/timestamps/values — the
    // exec must skip them instead of crashing on null primitives
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val tdf = Seq(
      (Option("A"), Option(10L), Option(1.0)),
      (Option.empty[String], Option(5L), Option(9.0)),
      (Option("A"), Option.empty[Long], Option(8.0)),
      (Option("A"), Option(20L), Option.empty[Double]))
      .toDF("symbol", "s", "price")
      .selectExpr("symbol", "timestamp_micros(s * 1000000) AS event_ts", "price")
    val pdf = Seq((Option("A"), Option(30L)), (Option.empty[String], Option(30L)),
        (Option("A"), Option.empty[Long]))
      .toDF("symbol", "s")
      .selectExpr("symbol", "timestamp_micros(s * 1000000) AS event_ts")
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = plan.output.find(_.name == n).get
    val p = pdf.queryExecution.analyzed
    val t = tdf.queryExecution.analyzed
    val node = graft.plans.AsOfJoinNode(p, t,
      attr(p, "symbol"), attr(p, "event_ts"),
      attr(t, "symbol"), attr(t, "event_ts"), attr(t, "price"))
    val out = org.apache.spark.sql.GraftPlanBridge.ofRows(spark, node)
      .selectExpr("symbol", "unix_micros(event_ts) / 1000000",
        "asof_value", "unix_micros(asof_ts) / 1000000")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(out == Set(("A", 30.0, 1.0, 10.0)))
  }
}
