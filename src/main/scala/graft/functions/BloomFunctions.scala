package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, Predicate, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter runtime filtering, exposed as session functions.
  *
  * Spark's own InjectRuntimeFilter builds exactly this pair — a
  * `BloomFilterAggregate` over the creation-side join keys whose binary
  * sketch feeds `BloomFilterMightContain` on the application side — but
  * only fires inside its cost heuristics. Registering the same catalyst
  * expressions as callable functions makes the pattern a first-class
  * user operator: pre-filter a huge fact scan by a dimension's key set
  * at O(bits) memory, then verify exactly with the real join
  * (candidates-then-verify; the bloom's false positives are killed by
  * the join, so results stay exact).
  *
  * Both expressions are Spark's own (codegen'd apply side; XXH64
  * hashing); nothing here reimplements hashing, so the sketch is
  * byte-compatible with Spark's injected runtime filters.
  */
object BloomFunctions {

  /** `graft_bloom_agg(key, estimatedNumItems)` — aggregate a column of
    * longs into a serialized bloom filter (binary). */
  def bloomAgg(es: Seq[Expression]): Expression = es match {
    case Seq(child) => new BloomFilterAggregate(child)
      .toAggregateExpression()
    case Seq(child, est: Literal) =>
      new BloomFilterAggregate(child, est.value.asInstanceOf[Number].longValue())
        .toAggregateExpression()
    case _ => throw new IllegalArgumentException(
      "graft_bloom_agg(key[, estimatedNumItems literal]) expected")
  }

  /** `graft_bloom_contains(filter, key)` — membership probe of a long
    * key against a serialized bloom filter (false positives possible,
    * false negatives impossible). A literal sketch becomes
    * [[GraftBloomProbe]] — bytes travel as a referenced object, so
    * EXPLAIN prints `graft_might_contain(<N>B, key)` instead of a
    * multi-hundred-KB hex literal; any other (foldable) filter
    * expression falls through to Spark's own BloomFilterMightContain. */
  def bloomContains(es: Seq[Expression]): Expression = es match {
    case Seq(Literal(bytes: Array[Byte], BinaryType), key) =>
      GraftBloomProbe(bytes, key)
    case Seq(filter, key) => BloomFilterMightContain(filter, key)
    case _ => throw new IllegalArgumentException(
      "graft_bloom_contains(filter, key) expected")
  }
}

/** Bloom membership probe with the sketch as a plan CONSTANT rather than
  * a child literal: deserialized once per (executor) instance, shipped by
  * Java serialization of the expression, surfaced to codegen as a
  * referenced object. Semantically identical to Spark's
  * BloomFilterMightContain over a binary literal (same
  * `org.apache.spark.util.sketch.BloomFilter`, same putLong/XXH64
  * hashing as BloomFilterAggregate's update path — sketches are
  * byte-compatible). */
case class GraftBloomProbe(sketch: Array[Byte], child: Expression)
    extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_might_contain"
  override def toString: String = s"$prettyName(${sketch.length}B, $child)"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.catalogString}")

  // Case-class equality on Array[Byte] is reference identity, which
  // would make two probes over identical sketches compare unequal and
  // defeat plan canonicalization (exchange/subquery reuse). Compare the
  // sketch by content instead.
  override def equals(other: Any): Boolean = other match {
    case p: GraftBloomProbe =>
      java.util.Arrays.equals(sketch, p.sketch) && child == p.child
    case _ => false
  }
  override def hashCode(): Int =
    31 * java.util.Arrays.hashCode(sketch) + child.hashCode()

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketch))

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
