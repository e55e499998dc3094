package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins session_window's exact-gap boundary: an event at EXACTLY
  * prev + gap CONTINUES the session (inclusive merge) — the semantics
  * the sessionize_native oracle mirrors with the lag form's strict >.
  * The fixtures never hit an exact µs gap, so only a crafted pair can
  * prove which side of the boundary Spark takes.
  */
class SessionBoundarySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = 1700000000000000L
  private val gapUs = 1800L * 1000000L

  private def sessions(offsets: Long*): Long =
    offsets.map(o => (1L, base + o)).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count().count()

  test("exactly-gap event merges; one microsecond past the gap splits") {
    assert(sessions(0L, gapUs) == 1, "exact-gap pair must merge")
    assert(sessions(0L, gapUs + 1) == 2, "gap+1µs pair must split")
    // chained exact gaps keep extending one session
    assert(sessions(0L, gapUs, 2 * gapUs) == 1)
  }
}
