package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable Bloom-filter aggregate: fold a string column into a fixed
 * `numBits`-bit filter (blob form, see [[graft.core.Bloom]]). The buffer
 * is `numBits` bits NO MATTER how many rows flow through — the bounded-
 * memory set sketch that replaces `collect_set` when the set side of a
 * semi-join reduction is too large to broadcast exactly.
 *
 * Merge is pointwise OR (commutative, associative, idempotent), so the
 * result is identical under any partial-aggregation tree Spark plans,
 * and eval() over zero rows publishes the empty filter (no probes hit).
 */
case class BloomAggExpr(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.graft.StringInputTypes {

  require(numBits > 0, "numBits must be positive")
  require(numHashes > 0 && numHashes <= 16, "numHashes must be in 1..16")

  override def createAggregationBuffer(): Array[Long] =
    graft.core.Bloom.alloc(numBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) graft.core.Bloom.add(buf, numHashes, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    graft.core.Bloom.orInto(b1, b2)

  override def eval(buf: Array[Long]): Any =
    graft.core.Bloom.toBlob(buf, numHashes)

  // the blob IS the serialized form (k and word count ride in its header,
  // and deserialize tolerates any valid blob, so spill/exchange round-trips
  // cannot drift from eval output)
  override def serialize(buf: Array[Long]): Array[Byte] =
    graft.core.Bloom.toBlob(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt() // numHashes: fixed by the plan, header kept for blob parity
    val words = bb.getInt()
    Array.fill(words)(bb.getLong())
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomAgg {
  /** Column API: fold a string column into a `numBits`-bit Bloom blob. */
  def bloom_agg(item: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(
      BloomAggExpr(Bridge.expression(item), numBits, numHashes).toAggregateExpression())
}
