package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe for plan/stage timing investigations (runMain).
  * Current question: when does the bloom runtime-filter semi-join
  * (`RelationalOps.bloomSemiJoin`) beat the plain semi-join? Expectation
  * from the plan shapes: never while the dim side broadcasts (the
  * broadcast hash semi-join already avoids shuffling the fact side), and
  * increasingly as soon as the join must shuffle (autoBroadcast off —
  * the 100 TB regime where a dimension outgrows the driver), because the
  * bloom prunes ~80% of the fact rows BEFORE the exchange. Warm numbers
  * (2nd rep) at sf0.1 and the synthesized sf1. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def fact = graft.Tables.lineitem(spark, dir)
    def dim = graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))

    def plain() = agg(fact.join(
      dim.select(col("o_orderkey")).distinct(),
      col("l_orderkey") === col("o_orderkey"), "left_semi"))
    def bloom() = agg(graft.ops.RelationalOps.bloomSemiJoin(
      fact, "l_orderkey", dim, "o_orderkey", 1000000L))

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var last = 0.0
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        last = (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-28s warm=$last%6.2f s")
    }

    println(s"[probe] dir=$dir fact=${fact.count()} dim=${dim.count()}")
    time("plain-semi broadcast")(plain())
    time("bloom-semi broadcast")(bloom())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("plain-semi shuffle")(plain())
    time("bloom-semi shuffle")(bloom())
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }
}
