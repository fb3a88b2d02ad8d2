package graft.core

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fixed-size Bloom filter over strings — the broadcastable set-membership
 * sketch behind bloom-accelerated semi-join reduction (prune a 100 TB scan
 * against a set whose exact broadcast would not fit, in constant memory).
 *
 * Double hashing (Kirsch-Mitzenmacher): two xxhash64 passes over the
 * UTF-8 bytes give h1, h2; probe i sets/tests bit (h1 + i*h2) mod m.
 * One-sided error: NO false negatives ever; false-positive rate
 * ~ (1 - e^{-kn/m})^k for n inserted items, m bits, k probes
 * (~0.8% at m/n = 10 bits per item, k = 5).
 *
 * The bit array is Array[Long] while aggregating (mergeable by pointwise
 * OR — commutative/associative/idempotent, so ANY combine tree and even
 * double-merged partials produce the identical filter) and is published
 * as a self-describing blob `[int32 k][int32 numWords][int64 words...]`
 * (big-endian) so a probe expression needs only the blob and the item.
 */
object Bloom {

  private val Seed1 = 0x5bc82b1cL
  private val Seed2 = 0x9747b28cL

  /** All-zero bit array holding at least `numBits` bits (rounded up to a
    * whole word; the effective modulus is words*64). */
  def alloc(numBits: Int): Array[Long] = {
    require(numBits > 0, s"numBits must be positive: $numBits")
    new Array[Long]((numBits + 63) / 64)
  }

  @inline private def h1(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
  @inline private def h2(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)

  /** Set the k probe bits of `s`. */
  def add(bits: Array[Long], numHashes: Int, s: UTF8String): Unit = {
    val m = bits.length.toLong * 64
    val a = h1(s); val b = h2(s)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(a + i * b, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Pointwise OR of `from` into `into` (same allocation size required). */
  def orInto(into: Array[Long], from: Array[Long]): Array[Long] = {
    require(into.length == from.length,
      s"bloom size mismatch: ${into.length} vs ${from.length} words")
    var i = 0
    while (i < into.length) { into(i) |= from(i); i += 1 }
    into
  }

  /** Publish as the self-describing probe blob. */
  def toBlob(bits: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(numHashes).putInt(bits.length)
    bits.foreach(bb.putLong)
    bb.array()
  }

  @inline private def wordAt(blob: Array[Byte], word: Int): Long = {
    val o = 8 + word * 8
    ((blob(o) & 0xffL) << 56) | ((blob(o + 1) & 0xffL) << 48) |
      ((blob(o + 2) & 0xffL) << 40) | ((blob(o + 3) & 0xffL) << 32) |
      ((blob(o + 4) & 0xffL) << 24) | ((blob(o + 5) & 0xffL) << 16) |
      ((blob(o + 6) & 0xffL) << 8) | (blob(o + 7) & 0xffL)
  }

  /** Membership probe straight off the blob bytes — no deserialization,
    * no allocation: k header-relative word reads per call. The header is
    * validated against the blob's actual length first: bloom_contains is
    * a general SQL function over any binary column, and a truncated or
    * foreign blob must fail LOUDLY, not read past the array or (k <= 0)
    * silently answer true for everything. */
  def mightContain(blob: Array[Byte], s: UTF8String): Boolean = {
    require(blob.length >= 8, s"malformed bloom blob: ${blob.length} bytes, need >= 8")
    val k = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    val words = ((blob(4) & 0xff) << 24) | ((blob(5) & 0xff) << 16) |
      ((blob(6) & 0xff) << 8) | (blob(7) & 0xff)
    require(k >= 1 && words >= 1 && blob.length >= 8 + words.toLong * 8,
      s"malformed bloom blob: header k=$k words=$words but ${blob.length} bytes")
    val m = words.toLong * 64
    val a = h1(s); val b = h2(s)
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(a + i * b, m)
      if ((wordAt(blob, (idx >>> 6).toInt) & (1L << (idx & 63))) == 0) return false
      i += 1
    }
    true
  }

  /** True when ANY element of a string array probes positive — the
    * in-row candidate test of bloom decontamination (no explode for the
    * common all-clean row). Null elements are skipped. */
  def anyMightContain(blob: Array[Byte], arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && mightContain(blob, arr.getUTF8String(i))) return true
      i += 1
    }
    false
  }
}
