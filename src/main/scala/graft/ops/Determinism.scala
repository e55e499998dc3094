package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our results against DuckDB running equivalent
  * SQL on the same parquet. Two sources of nondeterminism must be killed:
  *
  *  1. Floating-point SUM is order-sensitive; Spark's partial aggregation
  *     order differs run-to-run and engine-to-engine. Fix: round each
  *     addend to a fixed decimal scale (exact, order-independent decimal
  *     addition), cast the total back to double. A double is never exactly
  *     half-way at decimal scale 6 (0.0000005 is not a binary fraction),
  *     so round-to-nearest is unambiguous and identical in both engines.
  *     Oracle twin: CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE).
  *
  *  2. Row order: every query ends in an explicit orderBy over a unique
  *     key; oracle SQL carries the same ORDER BY with NULLS FIRST (Spark's
  *     ascending default) spelled out for DuckDB (whose default is LAST).
  *
  * min/max/arg_min/count and post-aggregation arithmetic on identical
  * doubles are bit-deterministic and need no treatment.
  */
object Determinism {
  /** Order-independent, engine-portable sum of a double column. */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Portable average: exact decimal sum divided by count, in doubles. */
  def exactAvg(c: Column): Column =
    exactSum(c) / count(c)

  /** Oracle-SQL twin of exactSum, for building DuckDB strings. */
  def sqlExactSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"

  def sqlExactAvg(expr: String): String =
    s"(${sqlExactSum(expr)} / COUNT($expr))"

  /** Composite argmin/argmax tie-break key: a (epoch-micros, id) STRUCT,
    * compared lexicographically — so min_by/max_by(price, key) is
    * deterministic even when several events share a timestamp (real tick
    * data does; the ×10 scale fixture provably does). Structs beat the
    * round-9 DECIMAL(38,0) scalar (micros·10^10 + id) two ways:
    * (1) NO range contract — any timestamp, any id magnitude; the
    * decimal form silently bled ids ≥ 10^10 into the timestamp digits,
    * and a BIGINT rebase can't hold both a multi-month micros span and
    * a wide id in 63 bits; (2) the per-row hot-path comparison is two
    * long compares instead of 38-digit decimal multiply-adds — measured
    * ~2× on the whole OHLC family (BASELINE.md round 11). Remaining
    * contract: `id` is UNIQUE (ties beyond (ts,id) are impossible) and
    * both fields non-null on aggregated rows. */
  def tsTieKey(ts: Column, id: Column): Column =
    struct(unix_micros(ts).as("k1"), id.as("k2"))

  /** Oracle-SQL twin of a Spark `min_by(value, tsTieKey(ts,id))`.
    * DuckDB 1.0's arg_min can't take a STRUCT ordering key, but its
    * min() over a struct IS lexicographic, so the twin packs the key
    * fields ahead of the value and extracts `.v` from the struct
    * extremum. `value` must be non-null (a null field would put the
    * whole struct under engine-specific null ordering). */
  def sqlArgMinTs(value: String, ts: String, id: String): String =
    s"(min(struct_pack(k1 := epoch_us($ts), k2 := ($id), v := ($value)))).v"

  /** Oracle-SQL twin of `max_by(value, tsTieKey(ts,id))`. */
  def sqlArgMaxTs(value: String, ts: String, id: String): String =
    s"(max(struct_pack(k1 := epoch_us($ts), k2 := ($id), v := ($value)))).v"

  /** IEEE −0.0 → +0.0 (adding +0.0 maps −0.0 to +0.0 and is identity on
    * every other double, NaN/±inf included). A round() landing on zero
    * from below yields −0.0 in one engine and +0.0 in the other —
    * different bit patterns, different repr in the driver's compare —
    * so a rounded value that can cross zero goes through this on BOTH
    * sides. */
  def noNegZero(c: Column): Column = c + lit(0.0)

  /** Oracle-SQL twin of [[noNegZero]]. */
  def sqlNoNegZero(expr: String): String = s"(($expr) + 0.0)"
}
