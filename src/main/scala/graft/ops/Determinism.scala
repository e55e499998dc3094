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

  /** Composite argmin/argmax tie-break key: epoch micros of `ts` scaled
    * by 10^10 plus the unique `id` — ONE orderable scalar both engines
    * compare identically, so min_by/max_by(price, key) is deterministic
    * even when several events share a timestamp (real tick data does;
    * the ×10 scale fixture provably does). Contract: 0 ≤ id < 10^10 and
    * ts ≥ epoch (both hold for every fixture and the MakeScale decade
    * fixtures, whose shifted ids stay under 10^10). Decimal(28,0)
    * micros × 10^10 tops out at ~27 digits — inside DECIMAL(38,0) on
    * the Spark side and HUGEINT on DuckDB's. */
  def tsTieKey(ts: Column, id: Column): Column =
    unix_micros(ts).cast(DecimalType(28, 0)) * lit(10000000000L) + id

  /** Oracle-SQL twin of [[tsTieKey]]. */
  def sqlTsTieKey(ts: String, id: String): String =
    s"(CAST(epoch_us($ts) AS HUGEINT) * 10000000000 + ($id))"

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
