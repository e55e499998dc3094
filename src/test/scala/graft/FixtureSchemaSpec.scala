package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed the on-disk type of `events.ts` twice (TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)/NTZ). Round 5 ended with 20 scattered analysis
  * errors all tracing to that one silent change. This spec pins, in ONE
  * place with named assertions:
  *   1. every fixture table exists at every SF and is non-empty,
  *   2. the key columns each operator family depends on exist with the
  *      SESSION type the loaders guarantee (after [[Tables]]
  *      normalization) — so the next regen fails loudly here first,
  *   3. the raw on-disk `ts` type is one of the shapes
  *      [[Tables.normalizeTs]] knows how to normalize.
  */
class FixtureSchemaSpec extends AnyFunSuite with SparkTestBase {
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("all fixture tables exist and are non-empty at every SF") {
    for (sf <- sfs; t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = Tables.load(spark, sf, t)
      assert(df.limit(1).count() == 1, s"$sf/$t is empty or unreadable")
    }
  }

  test("events.ts normalizes to session TimestampType at every SF") {
    for (sf <- sfs) {
      val t = Tables.events(spark, sf).schema("ts").dataType
      assert(t == TimestampType, s"$sf events.ts normalized to $t, want TimestampType")
    }
  }

  test("raw events.ts on-disk type is a shape normalizeTs handles") {
    for (sf <- sfs) {
      val raw = Tables.eventsOnDiskSchema(spark, sf)("ts").dataType
      assert(Set[DataType](LongType, TimestampNTZType, TimestampType).contains(raw),
        s"$sf events.ts on disk is $raw — extend Tables.normalizeTs before anything else")
    }
  }

  test("key columns used across the registry keep their contract types") {
    val sf = sfs.head
    def typeOf(df: org.apache.spark.sql.DataFrame, c: String) = df.schema(c).dataType
    val ev = Tables.events(spark, sf)
    assert(typeOf(ev, "user_id") == LongType || typeOf(ev, "user_id") == IntegerType)
    assert(typeOf(ev, "value").isInstanceOf[NumericType])
    assert(typeOf(ev, "event_type") == StringType)
    assert(typeOf(ev, "props") == StringType)
    val li = Tables.lineitem(spark, sf)
    assert(Set[DataType](DateType, StringType, TimestampType, TimestampNTZType)
      .contains(typeOf(li, "l_shipdate")), s"l_shipdate is ${typeOf(li, "l_shipdate")}")
    assert(typeOf(li, "l_quantity").isInstanceOf[NumericType])
    val doc = Tables.documents(spark, sf)
    assert(typeOf(doc, "text") == StringType)
    val emb = Tables.embeddings(spark, sf)
    assert(typeOf(emb, "embedding") == ArrayType(FloatType, containsNull = true) ||
      typeOf(emb, "embedding") == ArrayType(FloatType, containsNull = false) ||
      typeOf(emb, "embedding") == ArrayType(DoubleType, containsNull = true) ||
      typeOf(emb, "embedding") == ArrayType(DoubleType, containsNull = false),
      s"embeddings.embedding is ${typeOf(emb, "embedding")}")
  }
}
