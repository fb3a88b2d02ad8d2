package graft.core

import org.apache.spark.sql.catalyst.util.ArrayData

/**
 * Vector kernels called from generated code (static forwarders). All
 * accumulate sequentially left-to-right in double precision — bit-identical
 * to the zip_with/aggregate formulation they replace (and to a sequential
 * SQL reimplementation), so oracle parity is preserved.
 */
object VecMath {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /**
   * Product-quantization encode: for each of the `cb.length` subspaces,
   * the index of the nearest codeword (squared L2, sequential
   * accumulation, FIRST index on ties) of the vector's slice
   * `[j*dsub, (j+1)*dsub)`. `cb(j)(k)` is codeword k of subspace j;
   * subspaces may have different codeword counts (the exact-mode
   * codebook keeps one codeword per distinct subvector). Returns the
   * m codes as an int array.
   */
  def pqEncodeF(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData =
    pqEncode(cb, (i: Int) => v.getFloat(i).toDouble)

  def pqEncodeD(v: ArrayData, cb: Array[Array[Array[Double]]]): ArrayData =
    pqEncode(cb, (i: Int) => v.getDouble(i))

  private def pqEncode(cb: Array[Array[Array[Double]]],
      at: Int => Double): ArrayData = {
    val m = cb.length
    val codes = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val words = cb(j)
      val dsub = if (words.isEmpty) 0 else words(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < words.length) {
        val w = words(k)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = at(off + i) - w(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      codes(j) = best
      off += dsub
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
}
