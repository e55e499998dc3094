package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Harness-safety lint on REGISTERED output schemas.
  *
  * The driver's compare gate loads every registered query's parquet
  * output into pandas and sorts it; a top-level array/map/struct column
  * makes that sort throw (`unhashable type: numpy.ndarray`) and the
  * row goes red as `err` regardless of the values being right — round
  * 6's `doc_embed_hash` was the single red row of the round for exactly
  * this. The rule enforced here: a registered output is FLAT — scalar
  * columns only. An operator whose natural result is an array keeps the
  * array-valued DataFrame as its library API and registers a flattened
  * projection (explode to `(id, idx, component)` rows, or one scalar
  * column per slot like `minhash_signatures`).
  *
  * Batch queries are lazy, so this costs plan construction only; the
  * handful of eager-in-fn queries (streams, pipeline, warehouse DDL)
  * re-run their fixture-scale work once — the price of linting the
  * real registered schema rather than a guess.
  */
class OutputSchemaLintSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // No current query needs a complex top-level column; keep this empty
  // unless a future registration proves a harness-safe encoding (and
  // documents it here).
  private val allowlist: Set[String] = Set.empty

  SparkEntry.registry.foreach { q =>
    test(s"registered output of ${q.name} is flat (pandas-sortable)") {
      val complex = q.fn(spark, sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
          s"${f.name}: ${f.dataType.catalogString}"
      }
      assert(allowlist.contains(q.name) || complex.isEmpty,
        s"non-scalar registered output columns (the driver's pandas " +
          s"sort will throw on these): ${complex.mkString(", ")}")
    }
  }
}
