package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mutable second-moment buffer: count, per-dimension sums, and row-major
  * d×d outer-product sums (Σ xᵢxⱼ), dimension fixed by the first vector. */
final class VecOuterBuf(var n: Long, var sums: Array[Double],
    var outer: Array[Double])

/**
 * Single-pass second-moment aggregate over an `array<float>` column:
 * returns `struct(n: long, sums: array<double>, outer: array<double>)`
 * where `outer` is the row-major d×d matrix of Σ xᵢxⱼ — everything a
 * covariance / Gram / PCA computation needs, in ONE scan.
 *
 * The textbook alternative (posexplode twice + covar per (i,j) group)
 * shuffles d² rows per input vector; this buffer is one fixed d+d²
 * double array per partition, merged map-side, so the exchange carries
 * O(#partitions) ~33 KB blocks (d=64) regardless of corpus size — the
 * same bounded-state discipline as [[VecSumAgg]], which it supersets.
 *
 * Mixed dimensions fail loudly; null vectors and vectors containing a
 * null element are skipped whole (consistent with VecSumAgg).
 */
case class VecOuterAgg(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecOuterBuf]
  with org.apache.spark.sql.graft.FloatArrayInputTypes {

  override def createAggregationBuffer(): VecOuterBuf =
    new VecOuterBuf(0L, null, null)

  private def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def update(buf: VecOuterBuf, input: InternalRow): VecOuterBuf = {
    val v = vec.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (!hasNullElement(a)) {
        val d = a.numElements()
        if (buf.sums == null) {
          buf.sums = new Array[Double](d)
          buf.outer = new Array[Double](d * d)
        } else require(buf.sums.length == d,
          s"vec_outer_agg: mixed vector dimensions in one group " +
            s"(${buf.sums.length} vs $d)")
        val x = new Array[Double](d)
        var i = 0
        while (i < d) { x(i) = a.getFloat(i).toDouble; i += 1 }
        i = 0
        while (i < d) {
          buf.sums(i) += x(i)
          val row = i * d
          var j = 0
          while (j < d) { buf.outer(row + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        buf.n += 1
      }
    }
    buf
  }

  override def merge(b1: VecOuterBuf, b2: VecOuterBuf): VecOuterBuf = {
    if (b2.sums != null) {
      if (b1.sums == null) {
        b1.sums = b2.sums; b1.outer = b2.outer; b1.n = b2.n
      } else {
        require(b1.sums.length == b2.sums.length,
          s"vec_outer_agg: mixed vector dimensions in one group " +
            s"(${b1.sums.length} vs ${b2.sums.length})")
        var i = 0
        while (i < b1.sums.length) { b1.sums(i) += b2.sums(i); i += 1 }
        i = 0
        while (i < b1.outer.length) { b1.outer(i) += b2.outer(i); i += 1 }
        b1.n += b2.n
      }
    }
    b1
  }

  override def eval(buf: VecOuterBuf): Any = InternalRow(
    buf.n,
    if (buf.sums == null) null else new GenericArrayData(buf.sums),
    if (buf.outer == null) null else new GenericArrayData(buf.outer))

  // d = -1 encodes "no vector seen"; a real d = 0 group (empty arrays)
  // round-trips with its count intact (same contract as VecSumAgg)
  override def serialize(buf: VecOuterBuf): Array[Byte] = {
    val d = if (buf.sums == null) -1 else buf.sums.length
    val k = math.max(d, 0)
    val bb = ByteBuffer.allocate(12 + 8 * (k + k * k))
    bb.putLong(buf.n)
    bb.putInt(d)
    var i = 0
    while (i < k) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < k * k) { bb.putDouble(buf.outer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecOuterBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val d = bb.getInt()
    if (d < 0) new VecOuterBuf(n, null, null)
    else {
      val sums = new Array[Double](d)
      var i = 0
      while (i < d) { sums(i) = bb.getDouble(); i += 1 }
      val outer = new Array[Double](d * d)
      i = 0
      while (i < d * d) { outer(i) = bb.getDouble(); i += 1 }
      new VecOuterBuf(n, sums, outer)
    }
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("outer", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(vec)
  override def prettyName: String = "vec_outer_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0))
}

object VecOuterAgg {
  /** Column API: per-group count + elementwise sums + row-major outer-
    * product sums as `struct(n, sums, outer)`. */
  def vec_outer_agg(vec: Column): Column =
    Bridge.column(VecOuterAgg(Bridge.expression(vec)).toAggregateExpression())
}
