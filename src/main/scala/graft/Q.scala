package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the fixture dir,
  * and (when SQL-expressible) a DuckDB oracle the driver hash-compares
  * against. Conventions (see ops.Determinism):
  *  - every query ends in an explicit orderBy over a unique key;
  *  - the oracle carries the same ORDER BY with NULLS FIRST spelled out;
  *  - double sums go through fixed-scale decimals in both engines;
  *  - column names/aliases are identical on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, fn: (SparkSession, String) => DataFrame,
            oracle: String): Q = Q(name, fn, Some(oracle))
}
