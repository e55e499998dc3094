package graft

import java.sql.Timestamp

import graft.ops.{BehaviorOps, LinkageOps, RelationalOps, WarehouseOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral analytics (cohort/funnel), record linkage, upsert, and the
  * bloom runtime-filter: semantics the DuckDB oracle can't probe —
  * strict funnel ordering, block-cap recall trades, null-update
  * fallback, and the bloom actually pruning before the exact verify.
  */
class BehaviorLinkageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cohortRetention: offsets count only the cohort's own actives") {
    // u1 first seen d1, active d1+d2; u2 first seen d1, active d1 only
    // (two events same day collapse); u3 first seen d2, active d2+d3.
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-02 09:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 23:00:00"), "click"),
      (3L, ts("2024-01-02 08:00:00"), "view"),
      (3L, ts("2024-01-03 08:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = BehaviorOps.cohortRetention(events)
      .orderBy("cohort_date", "day_offset")
      .select(col("cohort_date").cast("string"), col("day_offset"),
        col("n_active"), col("n_cohort"), col("retention"))
      .as[(String, Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0),
      ("2024-01-02", 1, 1L, 1L, 1.0)))
  }

  test("funnel: strictly-after ordering, not mere presence") {
    val events = Seq(
      // u1 converts fully in order
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 09:05:00"), "click"),
      (1L, ts("2024-01-01 09:10:00"), "purchase"),
      // u2 purchased BEFORE clicking — must stop at click
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:01:00"), "purchase"),
      (2L, ts("2024-01-01 09:02:00"), "click"),
      // u3 clicked at EXACTLY the view time — strict > excludes it
      (3L, ts("2024-01-01 09:00:00"), "view"),
      (3L, ts("2024-01-01 09:00:00"), "click"),
      // u4 never viewed — not even step 1
      (4L, ts("2024-01-01 09:00:00"), "click"),
      (4L, ts("2024-01-01 09:01:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = BehaviorOps.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step")
      .select(col("step"), col("n_users"), col("conversion"))
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((1, 3L, 1.0), (2, 2L, 0.666667), (3, 1L, 0.333333)))
  }

  test("funnel: a later in-order event still converts after a false start") {
    // purchase → click → purchase: the second purchase (after the click)
    // converts — earliest event strictly after the previous step wins.
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 09:01:00"), "purchase"),
      (1L, ts("2024-01-01 09:02:00"), "click"),
      (1L, ts("2024-01-01 09:03:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = BehaviorOps.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step").select(col("n_users")).as[Long].collect().toSeq
    assert(got == Seq(1L, 1L, 1L))
  }

  test("fuzzySelfJoin: verifies distance inside blocks and caps hot blocks") {
    val rel = (
      Seq(("a1", "red bolt", "bolt"), ("a2", "hot bolt", "bolt"),
        ("a3", "red plate", "plate"), ("a4", "red plates", "plate"),
        ("a5", "cold anvil", "anvil")) ++
        // planted hot block: 50 members > maxBlock=10 — dropped whole
        (1 to 50).map(i => (f"h$i%02d", s"gear $i", "gear"))
      ).toDF("id", "name", "block")
    val got = LinkageOps.fuzzySelfJoin(rel, maxDist = 3, maxBlock = 10)
      .orderBy("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("dist"))
      .as[(String, String, Int)].collect().toSeq
    // bolt pair dist 3 kept; plate pair dist 1 kept; anvil alone; the
    // gear block (50 names, many within distance) contributes NOTHING.
    assert(got == Seq(("a1", "a2", 3), ("a3", "a4", 1)))
  }

  test("upsert: updates win, inserts land, untouched rows survive, " +
    "null update values fall back to base") {
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "status", "price")
    val updates = Seq((2L, "U", 99.0), (4L, "N", 40.0),
        (3L, null.asInstanceOf[String], 33.0))
      .toDF("k", "status", "price")
    val got = WarehouseOps.upsert(base, updates, "k")
      .orderBy("k")
      .select(col("k"), col("status"), col("price"), col("__src"))
      .as[(Long, String, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 10.0, "kept"),
      (2L, "U", 99.0, "updated"),
      (3L, "C", 33.0, "updated"), // null status fell back to base's C
      (4L, "N", 40.0, "inserted")))
  }

  test("upsert collapses duplicate update keys deterministically " +
    "(greatest non-key tuple wins, no row fan-out)") {
    // real MERGE errors on multiple source matches; our documented
    // policy collapses them BEFORE the full-outer join — without it
    // each duplicate fans out into duplicate output rows (hit at the
    // sf1 MakeScale fixture, where +1e8 insert keys aliased the next
    // copy's update keys)
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0))
      .toDF("k", "status", "price")
    val updates = Seq((2L, "U", 50.0), (2L, "U", 99.0), (2L, "T", 999.0),
        (5L, "N", 1.0), (5L, "N", 2.0))
      .toDF("k", "status", "price")
    val got = WarehouseOps.upsert(base, updates, "k")
      .orderBy("k")
      .select(col("k"), col("status"), col("price"), col("__src"))
      .as[(Long, String, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 10.0, "kept"),
      (2L, "U", 99.0, "updated"), // ("U",99) > ("U",50); ("T",…) loses on field 1
      (5L, "N", 2.0, "inserted")))
  }

  test("scd2FromChangeLog collapses runs and emits half-open validity") {
    val log = Seq(
      // k1: A, A (collapse), B, A again (NEW run — not merged with row 1)
      (1L, java.sql.Date.valueOf("2024-01-01"), "A"),
      (1L, java.sql.Date.valueOf("2024-01-05"), "A"),
      (1L, java.sql.Date.valueOf("2024-02-01"), "B"),
      (1L, java.sql.Date.valueOf("2024-03-01"), "A"),
      // k2: single version, current from day one
      (2L, java.sql.Date.valueOf("2024-01-10"), "X")
    ).toDF("k", "d", "status")
    val got = graft.ops.WarehouseOps
      .scd2FromChangeLog(log, "k", "d", Seq("status"))
      .orderBy("k", "effective_from")
      .select(col("k"), col("status"), col("effective_from").cast("string"),
        col("effective_to").cast("string"), col("is_current"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3), r.getBoolean(4)))
    assert(got == Seq(
      (1L, "A", "2024-01-01", "2024-02-01", false),
      (1L, "B", "2024-02-01", "2024-03-01", false),
      (1L, "A", "2024-03-01", null, true),
      (2L, "X", "2024-01-10", null, true)))
  }

  test("upsert rejects mismatched schemas") {
    val base = Seq((1L, "A")).toDF("k", "status")
    val bad = Seq((1L, 2.0)).toDF("k", "price")
    assertThrows[IllegalArgumentException] {
      WarehouseOps.upsert(base, bad, "k")
    }
  }

  test("funnel survives zero step-1 users: rows stay, conversion is null") {
    // clicks only — nobody enters the funnel; the per-step rows must
    // still exist and the 0/0 rate must be null, not an ANSI throw
    val events = Seq((1L, ts("2024-01-01 09:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = BehaviorOps.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step")
      .select(col("step"), col("n_users"), col("conversion"))
      .collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.isNullAt(2)))
    assert(got == Seq((1, 0L, true), (2, 0L, true), (3, 0L, true)))
  }

  test("upsert degenerate sides: empty updates keep all; empty base inserts all") {
    val base = Seq((1L, "A", 10.0)).toDF("k", "status", "price")
    val empty = base.filter(lit(false))
    val kept = WarehouseOps.upsert(base, empty, "k")
      .select(col("k"), col("__src")).as[(Long, String)].collect().toSeq
    assert(kept == Seq((1L, "kept")))
    val inserted = WarehouseOps.upsert(empty, base, "k")
      .select(col("k"), col("__src")).as[(Long, String)].collect().toSeq
    assert(inserted == Seq((1L, "inserted")))
  }

  test("fuzzyBlockRecall refuses an oversized name vocabulary, fast") {
    // 2001 distinct names > cap 2000: the guard must trip BEFORE the
    // all-pairs crossJoin (which at a real vocab size would never finish)
    val big = (1 to 2001).map(i => f"name $i%05d").toDF("p_name")
    val err = intercept[IllegalArgumentException] {
      LinkageOps.fuzzyBlockRecall(big, maxDist = 1, maxExactNames = 2000L)
    }
    assert(err.getMessage.contains("2001"))
    // and the same fixture under the cap still evaluates
    val small = (1 to 50).map(i => f"name $i%05d").toDF("p_name")
    val ok = LinkageOps.fuzzyBlockRecall(small, maxDist = 1,
      maxExactNames = 2000L).collect()
    assert(ok.length == 1)
  }

  test("GraftBloomProbe compares sketches by content (plan canonicalization)") {
    functions.GraftFunctions.register(spark)
    val dim = spark.range(100).select(col("id").as("dk"))
    val sketch = dim.agg(call_function("graft_bloom_agg", col("dk"),
      lit(100L)).as("bf")).head().getAs[Array[Byte]]("bf")
    val key = org.apache.spark.sql.catalyst.expressions.Literal(42L)
    val p1 = functions.GraftBloomProbe(sketch.clone(), key)
    val p2 = functions.GraftBloomProbe(sketch.clone(), key)
    // distinct arrays, equal content: equals/hashCode must agree, or
    // exchange/subquery reuse over identical probes silently misses
    assert(p1 == p2 && p1.hashCode == p2.hashCode)
    assert(p1 != functions.GraftBloomProbe(Array[Byte](1, 2), key))
  }

  test("bloomSemiJoin with an empty dim returns empty without crashing") {
    val fact = spark.range(100).select(col("id").as("fk"))
    val dim = spark.range(10).select(col("id").as("dk"))
      .filter(lit(false))
    assert(RelationalOps.bloomSemiJoin(fact, "fk", dim, "dk", 100L)
      .count() == 0L)
  }

  test("bloomSemiJoin: exact result, and the bloom prunes before the join") {
    val fact = spark.range(10000)
      .select(col("id").as("fk"), (col("id") % 7).as("v"))
    val dim = spark.range(100).select((col("id") * 100).as("dk"))
    val got = RelationalOps.bloomSemiJoin(fact, "fk", dim, "dk", 1000L)
    // exact: identical to the plain semi-join
    val expect = fact.join(dim, col("fk") === col("dk"), "left_semi")
    assert(got.orderBy("fk").collect().toSeq ==
      expect.orderBy("fk").collect().toSeq)
    // the bloom probe is in the plan, BEFORE the exact semi join
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
    // and it actually prunes: candidates passing the bloom are far fewer
    // than the fact rows (fpp ~3% at these sizes)
    functions.GraftFunctions.register(spark)
    val sketch = dim.agg(call_function("graft_bloom_agg", col("dk"),
      lit(1000L)).as("bf")).head().getAs[Array[Byte]]("bf")
    val candidates = fact.filter(
      call_function("graft_bloom_contains", lit(sketch), col("fk"))).count()
    assert(candidates >= 100, s"bloom lost true keys: $candidates")
    assert(candidates < 1000, s"bloom pruned nothing: $candidates of 10000")
  }
}
