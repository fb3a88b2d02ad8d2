package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate: keeps the k best (sim desc, id asc) entries per
 * group in a fixed-size buffer, merged map-side before the shuffle.
 *
 * This replaces `row_number() OVER (PARTITION BY q_id)` ranking for top-k
 * search: the window form shuffles EVERY scored row into #distinct(q_id)
 * partitions — with a handful of probe queries that is a handful of tasks
 * receiving the whole scored relation. Here each input partition reduces to
 * at most k entries per group before the exchange, so the shuffle carries
 * O(#partitions * #queries * k) rows regardless of corpus size, and the
 * final merge per query is a tiny k-way list merge.
 *
 * Buffer is an unsorted pair list compacted to k whenever it reaches 2k —
 * O(log k) amortized per row, at most 16k bytes per group in flight.
 */
case class TopKAgg(
    sim: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with org.apache.spark.sql.graft.DoubleLongInputTypes {

  require(k > 0, "k must be positive")

  // best first: higher sim wins, ties broken by lower id. Double.compare
  // places NaN above +Inf, so a NaN sim ranks FIRST — identical to the
  // `row_number() OVER (ORDER BY sim DESC)` window this aggregate replaces
  // (an Ordering.by(-s) would negate NaN to NaN and rank it last).
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(y._1, x._1)
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val kept = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k)

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = sim.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)], b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    compact(b1 ++= b2)

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sorted(ord).take(k).map { case (s, i) =>
      InternalRow(i, s)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf)
    val bb = ByteBuffer.allocate(4 + 16 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((bb.getDouble(), bb.getLong())); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("c_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sim, id)
  override def prettyName: String = "topk_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sim = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column API: top-k (sim double desc, id long asc) entries per group as
    * array&lt;struct&lt;c_id,sim&gt;&gt;, best first. */
  def topk_agg(sim: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(sim), Bridge.expression(id), k)
      .toAggregateExpression())
}
