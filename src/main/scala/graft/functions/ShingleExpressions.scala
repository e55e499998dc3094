package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct word-k-shingling, shared by codegen and interpreted
  * paths. Exactly equivalent to the declarative formulation in
  * ops.TextOps.shingles — split(trim(text), "\s+"), k-gram join with
  * single spaces, array_distinct keeping first occurrence — which remains
  * the oracle's definition. */
object ShingleUtil {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, k: Int): ArrayData = {
    val toks = ws.split(text.toString.trim, -1)
    if (toks.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_shingles(text, k)` — codegen'd shingling for the dedup hot
  * path (the interpreted transform/slice/concat_ws chain dominates the
  * shingle-based queries otherwise). */
case class Shingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleUtil.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {
  /** Builder for the function registry: second arg must be an int literal. */
  def fromArgs(es: Seq[Expression]): Expression = es match {
    case Seq(c, Literal(k: Int, _)) => Shingles(c, k)
    case _ => throw new IllegalArgumentException(
      "graft_shingles(text, k) requires a literal int k")
  }
}
