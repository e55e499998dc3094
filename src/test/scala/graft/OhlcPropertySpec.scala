package graft

import graft.ops.TickOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.3): OHLC invariants and QC partition
  * laws over generated tick streams. ScalaCheck generators are driven
  * directly with fixed seeds (the scalatest-scalacheck bridge isn't in
  * the offline dependency set).
  */
class OhlcPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val tickGen = for {
    sym <- Gen.oneOf("AAA", "BBB", "CCC")
    secOfDay <- Gen.choose(0L, 86399L)
    price <- Gen.choose(1.0, 1000.0)
    id <- Gen.choose(1L, Long.MaxValue / 2)
  } yield (sym, new java.sql.Timestamp(1704067200000L + secOfDay * 1000), price, id)

  test("property: generated streams satisfy bar invariants and counts") {
    (1L to 5L).foreach { seed =>
      val ticks = sample(Gen.listOfN(200, tickGen), seed)
      val df = ticks.toDF("symbol", "event_ts", "price", "event_id")
        .dropDuplicates("symbol", "event_ts") // unique (sym, ts) like fixtures
      val bars = TickOps.ohlcBars(df, "1 hour").collect()
      bars.foreach { r =>
        val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"))
        assert(l <= o && o <= h && l <= c && c <= h,
          s"invariant violated at seed $seed: o=$o h=$h l=$l c=$c")
      }
      // bar count = distinct (hour, symbol) buckets
      val buckets = df.select(date_trunc("hour", col("event_ts")), col("symbol"))
        .distinct().count()
      assert(bars.length.toLong == buckets)
      // total ticks preserved
      assert(bars.map(_.getAs[Long]("n_ticks")).sum == df.count())
    }
  }

  test("property: valid/invalid partition the input for any null pattern") {
    val rowGen = for {
      price <- Gen.option(Gen.choose(-10.0, 10.0))
      qty <- Gen.option(Gen.choose(-10.0, 10.0))
    } yield (price, qty)
    (1L to 5L).foreach { seed =>
      val rows = sample(Gen.listOfN(100, rowGen), seed)
      val df = rows.zipWithIndex
        .map { case ((p, q), i) => (i.toLong, p, q) }
        .toDF("id", "price", "qty")
      val inv = TickOps.invalidRows(df, Seq("price", "qty"))
      val valid = TickOps.validRows(df, Seq("price", "qty"))
      assert(inv.count() + valid.count() == df.count())
      val expectInvalid = rows.count { case (p, q) =>
        p.isEmpty || q.isEmpty || p.exists(_ < 0) || q.exists(_ < 0) }
      assert(inv.count() == expectInvalid.toLong)
    }
  }
}
