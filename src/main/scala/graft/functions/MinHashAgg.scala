package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash sketch as a `TypedImperativeAggregate` (SURVEY.md §2.10's
  * optional custom-aggregate surface): one mutable long[nHashes] buffer
  * per group holds all signature slots, updated with the affine rehash
  * family from [[Hashing]] and merged element-wise — the single-buffer
  * alternative to n separate `min(...)` aggregates. Map-side partial
  * aggregation applies as usual (update on partials, min-merge on
  * exchange), so the shuffle carries one small array per (group,
  * partition). Input is the 31-bit base hash column.
  */
case class MinHashAgg(child: Expression, nHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val coeffs = Hashing.affineCoeffs(nHashes).toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < nHashes) {
        val (a, b) = coeffs(i)
        val x = (a * h + b) % Hashing.Mersenne31
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(nHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(nHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object MinHashAgg {
  def fromArgs(es: Seq[Expression]): Expression = es match {
    case Seq(c, Literal(n: Int, _)) => MinHashAgg(c, n)
    case _ => throw new IllegalArgumentException(
      "graft_minhash(hash, nHashes) requires a literal int nHashes")
  }
}
