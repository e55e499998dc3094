package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass SimHash of a text column.
  *
  * The declarative form (explode tokens → per-bit vote SUM → pack) costs
  * an explode and a hash-aggregate SHUFFLE per corpus pass. But SimHash
  * is a per-document scalar: this expression computes the token votes and
  * packs the signature in one pass over the string, turning the whole
  * signature stage into a narrow map — no exchange at all, which at
  * 100 TB is the difference between a shuffle of |tokens| rows and none.
  *
  * Semantics are bit-identical to the aggregate form and the DuckDB
  * oracle (`OracleFrags.simhashSql`): whitespace tokens of the trimmed
  * text (every occurrence votes), token hash = md5-60bit % (2^31-1),
  * bit j of the signature = sign of vote sum j.
  */
object SimHash {
  def compute(s: UTF8String, nBits: Int): Long = {
    // UTF8String.trim strips ASCII-32 spaces ONLY — the semantics of SQL
    // trim and therefore of the aggregate twin's split(trim(text), ..).
    // Java String.trim would also strip \t\n\r and silently change the
    // token list (a trailing "\n" yields a trailing "" token in the SQL
    // form that must vote here too).
    val toks = s.trim().toString.split("\\s+", -1)
    val votes = new Array[Int](nBits)
    var t = 0
    while (t < toks.length) {
      val h = Md5Hash.hash(UTF8String.fromString(toks(t))) % Hashing.Mersenne31
      var j = 0
      while (j < nBits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }
}

case class SimHashExpr(child: Expression, nBits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && nBits >= 1 && nBits <= 32)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, 1 <= nBits <= 32), got " +
        s"${child.dataType.catalogString} with nBits=$nBits")

  override protected def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  def fromArgs(es: Seq[Expression]): Expression = es match {
    case Seq(text, Literal(n: Int, IntegerType)) => SimHashExpr(text, n)
    case Seq(text) => SimHashExpr(text, 32)
    case _ => throw new IllegalArgumentException(
      "graft_simhash(text[, nBits literal]) expected")
  }
}
