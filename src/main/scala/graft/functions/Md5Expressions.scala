package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side md5→60-bit hash, shared by codegen and interpreted paths.
  * Value is identical to `conv(substr(md5(s),1,15),16,10)`: the first 15
  * hex digits are the top 60 bits of the digest, i.e. the first 8 bytes
  * read big-endian, shifted right 4 (unsigned). */
object Md5Hash {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hash(s: UTF8String): Long = hash(s.getBytes)
}

/** Codegen'd md5-prefix hash of a string column — the hot inner operation
  * of every dedup/fingerprint query. Equal by construction to
  * functions.Hashing.md5Long (the conv/substring formulation the DuckDB
  * oracle uses), without materializing the 32-char hex string. */
case class Md5Long60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5long60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
