package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mutable elementwise-sum buffer: vector count + per-dimension double
  * sums, dimension fixed by the first vector seen. */
final class VecSumBuf(var n: Long, var sums: Array[Double])

/**
 * Elementwise vector-sum aggregate over an `array<float>` column: returns
 * `struct(n: long, sums: array<double>)` per group — the one-exchange
 * building block for centroids, per-class mean embeddings, and drift
 * monitoring.
 *
 * The textbook form (posexplode -> groupBy(key, pos) -> avg) shuffles
 * dim× the corpus row count; this aggregate's state is one fixed
 * dim-double vector per group, merged map-side, so the exchange carries
 * O(#partitions * #groups) small vectors regardless of corpus size —
 * the same bounded-state discipline as TopKAgg/FreqAgg.
 *
 * Mixed dimensions in one group fail loudly (a silent zip would average
 * apples with truncated oranges). Null vectors and null elements are
 * skipped (element-null skips the WHOLE vector, keeping n consistent
 * across dimensions).
 */
case class VecSumAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuf]
  with org.apache.spark.sql.graft.FloatArrayInputTypes {

  override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(0L, null)

  private def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def update(buf: VecSumBuf, input: InternalRow): VecSumBuf = {
    val v = vec.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (!hasNullElement(a)) {
        val d = a.numElements()
        if (buf.sums == null) buf.sums = new Array[Double](d)
        else require(buf.sums.length == d,
          s"vec_sum_agg: mixed vector dimensions in one group " +
            s"(${buf.sums.length} vs $d)")
        var i = 0
        while (i < d) { buf.sums(i) += a.getFloat(i).toDouble; i += 1 }
        buf.n += 1
      }
    }
    buf
  }

  override def merge(b1: VecSumBuf, b2: VecSumBuf): VecSumBuf = {
    if (b2.sums != null) {
      if (b1.sums == null) { b1.sums = b2.sums; b1.n = b2.n }
      else {
        require(b1.sums.length == b2.sums.length,
          s"vec_sum_agg: mixed vector dimensions in one group " +
            s"(${b1.sums.length} vs ${b2.sums.length})")
        var i = 0
        while (i < b1.sums.length) { b1.sums(i) += b2.sums(i); i += 1 }
        b1.n += b2.n
      }
    }
    b1
  }

  override def eval(buf: VecSumBuf): Any = InternalRow(
    buf.n,
    if (buf.sums == null) null else new GenericArrayData(buf.sums))

  // d = -1 encodes "no vector seen" (sums == null); d = 0 is a REAL
  // zero-dimension sum (rows held empty arrays) and must round-trip with
  // its count intact, or n would depend on whether an exchange sat
  // between partial and final aggregation
  override def serialize(buf: VecSumBuf): Array[Byte] = {
    val d = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(12 + 8 * math.max(d, 0))
    bb.putLong(buf.n)
    bb.putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val d = bb.getInt()
    if (d < 0) new VecSumBuf(n, null)
    else {
      val sums = new Array[Double](d)
      var i = 0
      while (i < d) { sums(i) = bb.getDouble(); i += 1 }
      new VecSumBuf(n, sums)
    }
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(vec)
  override def prettyName: String = "vec_sum_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

object VecSumAgg {
  /** Column API: per-group elementwise vector sum + count as
    * `struct(n long, sums array&lt;double&gt;)`. */
  def vec_sum_agg(vec: Column): Column =
    Bridge.column(VecSumAgg(Bridge.expression(vec)).toAggregateExpression())
}
