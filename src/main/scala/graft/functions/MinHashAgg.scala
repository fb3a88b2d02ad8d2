package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

import graft.operators.Dedup

/**
 * Custom Catalyst aggregate (the UDAF surface the reference lacks,
 * SURVEY.md §2.10): merges per-document shingle-hash arrays into a k-min
 * MinHash signature per GROUP — one pass, mergeable partial states, so a
 * corpus-level signature costs a single map-side-combined aggregation at
 * any scale. Buffer = k running minima (fixed 8*k bytes, spill-friendly).
 *
 * Signature semantics are identical to Dedup.minhashSignature (same
 * universal-hash permutation constants), so group signatures are
 * comparable with document signatures.
 */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k > 0 && k <= Dedup.MinhashA.length,
    s"k must be in 1..${Dedup.MinhashA.length}")

  private val as = Dedup.MinhashA.take(k).toArray
  private val bs = Dedup.MinhashB.take(k).toArray
  private val p = Dedup.MinhashP

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr != null) {
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h = arr.getLong(j)
          var i = 0
          while (i < k) {
            val m = (as(i) * h + bs(i)) % p
            if (m < buf(i)) buf(i) = m
            i += 1
          }
        }
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: aggregate an array<long> hash column into a k-min signature. */
  def minhash_agg(hashes: Column, k: Int = 8): Column =
    Bridge.column(MinHashAgg(Bridge.expression(hashes), k).toAggregateExpression())
}
