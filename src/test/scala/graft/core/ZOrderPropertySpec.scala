package graft.core

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the Morton interleave kernel: equality with
  * an independent reference, bijectivity (deinterleave recovers every
  * dimension), and strict range policing. */
object ZOrderPropertySpec extends Properties("ZOrder") {

  private def ref(vals: Seq[Long], bits: Int): Long = {
    var out = 0L
    for (b <- 0 until bits; j <- vals.indices)
      out |= ((vals(j) >> b) & 1L) << (b * vals.size + j)
    out
  }

  private def deinterleave(z: Long, k: Int, bits: Int): Seq[Long] =
    (0 until k).map { j =>
      (0 until bits).map(b => ((z >> (b * k + j)) & 1L) << b).sum
    }

  private val dims: Gen[(Int, List[Long])] = for {
    k <- Gen.choose(2, 6)
    bits = ZOrder.bitsPer(k)
    vals <- Gen.listOfN(k, Gen.oneOf(
      Gen.choose(0L, (1L << bits) - 1),
      Gen.oneOf(0L, 1L, (1L << bits) - 1, (1L << (bits - 1)))))
  } yield (k, vals)

  property("matches the reference construction") = Prop.forAll(dims) {
    case (k, vals) =>
      ZOrder.interleave(vals.toArray, ZOrder.bitsPer(k)) ==
        ref(vals, ZOrder.bitsPer(k))
  }

  property("is a bijection: deinterleave recovers every dimension") =
    Prop.forAll(dims) { case (k, vals) =>
      val bits = ZOrder.bitsPer(k)
      deinterleave(ZOrder.interleave(vals.toArray, bits), k, bits) == vals
    }

  property("rejects out-of-range values") = Prop.forAll(dims) {
    case (k, vals) =>
      val bits = ZOrder.bitsPer(k)
      val tooBig = vals.updated(0, 1L << bits)
      val negative = vals.updated(vals.size - 1, -1L)
      Prop.throws(classOf[IllegalArgumentException]) {
        ZOrder.interleave(tooBig.toArray, bits)
      } && Prop.throws(classOf[IllegalArgumentException]) {
        ZOrder.interleave(negative.toArray, bits)
      }
  }
}
