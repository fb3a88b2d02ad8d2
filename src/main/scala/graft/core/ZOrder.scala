package graft.core

/**
 * Morton (Z-order) bit interleaving — the space-filling-curve clustering
 * key behind lakehouse multi-column data skipping (Delta OPTIMIZE ZORDER,
 * Hudi/Iceberg z-ordering): sorting by the interleaved key gives every
 * storage chunk a tight min/max range in EVERY participating column at
 * once, so a predicate on any of them prunes chunks — where a plain sort
 * serves only its leading column.
 *
 * Bit layout: dimension j of k contributes its bit b to output position
 * `b*k + j` — low bits interleave first, so nearby (a, b) points share
 * high-order output bits. With k dimensions each value must fit
 * `62 / k` bits (31 bits at k=2); out-of-range inputs throw rather than
 * silently fold distant points together.
 */
object ZOrder {

  def bitsPer(k: Int): Int = {
    require(k >= 2 && k <= 6, s"z-order supports 2..6 dimensions, got $k")
    62 / k
  }

  /** Interleaves `vals` (each in [0, 2^bitsPer)) into one non-negative
    * long. Sequential bit loop — called from generated code. */
  def interleave(vals: Array[Long], bits: Int): Long = {
    val k = vals.length
    var j = 0
    while (j < k) {
      val v = vals(j)
      if (v < 0L || v >= (1L << bits))
        throw new IllegalArgumentException(
          s"z_order: value $v of dimension $j outside [0, 2^$bits) — " +
            "normalize (rank/scale/offset) inputs first")
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      var j2 = 0
      while (j2 < k) {
        out |= ((vals(j2) >> b) & 1L) << (b * k + j2)
        j2 += 1
      }
      b += 1
    }
    out
  }
}
