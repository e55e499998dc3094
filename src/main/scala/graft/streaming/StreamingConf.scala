package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming-query sizing: `spark.sql.shuffle.partitions` doubles as the
  * STATE STORE count for stateful streaming (fixed at the first
  * checkpoint), and every micro-batch commits every store — so a
  * stateful query's partition count should track its stateful-key
  * throughput, not the batch engine's scan width. The fixtures carry a
  * few active keys per store at 32 partitions and pay ~3× the runtime in
  * commit overhead (measured: 13.7 s → 4.0 s on the stream-stream join
  * at sf0.1 going 32 → 8). On a cluster the same sizing is done
  * per-query; 8 here keeps local runs honest without changing results.
  */
private[graft] object StreamingConf {

  val StateParts = 8

  /** Run `body` (start + await a streaming query) with the shuffle
    * partition count temporarily sized for state, restoring after.
    *
    * CONTRACT — not concurrency-safe on a shared session: the conf is
    * session-global, so any query PLANNED on `spark` while `body` runs
    * would also plan at `n` shuffle partitions. Spark offers no
    * per-query override (the state-store count is captured from the
    * session conf at the first checkpoint), so per-query isolation
    * means a per-query session: a caller that must plan batch work
    * concurrently with a streaming run should hand the streaming
    * module `spark.newSession()` (shares the context and the
    * warehouse, owns its SQLConf) and build the stream on THAT — the
    * production shape, one session per streaming job. The engine's
    * own query registry executes one query at a time per session
    * (Verify/Bench are sequential), so the in-place toggle is safe
    * everywhere it is used here. */
  def withStatePartitions[T](spark: SparkSession, n: Int = StateParts)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
