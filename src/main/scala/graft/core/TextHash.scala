package graft.core

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-hashing kernels called from generated code. shingleHash32 equals
 * `CAST(conv(substring(md5(s),1,8),16,10) AS BIGINT)` — the first four
 * digest bytes read as an unsigned 32-bit big-endian integer — so values
 * are identical to the SQL/DuckDB formulation, just without the
 * hex-string detour.
 */
object TextHash {

  /** MinHash permutation constants (see Dedup scaladoc for the rationale). */
  val MinhashP = 4294967311L // prime > 2^32
  val MinhashA: Array[Long] = Array(1073741827L, 998244353L, 805306457L,
    754974721L, 536870923L, 469762049L, 268435459L, 167772161L)
  val MinhashB: Array[Long] = Array(12345L, 67890L, 111213L, 141516L,
    171819L, 202122L, 232425L, 262728L)

  private val tl = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def shingleHash32(s: UTF8String): Long = {
    val md = tl.get()
    md.reset()
    val dig = md.digest(s.getBytes)
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  /** array<string> shingles -> array<long> 32-bit hashes. */
  def shingleHashes(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = shingleHash32(shingles.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Winnowing (MOSS-style rolling-hash document fingerprinting): the
   * minimum hash of every sliding window of `w` consecutive k-gram hashes,
   * returned as sorted distinct values. Guarantee: any shared substring of
   * length >= w+k-1 between two documents yields at least one shared
   * fingerprint. O(n) via a monotonic deque. Fewer than w hashes collapse
   * to a single window (the global minimum).
   */
  def winnow(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mins = new java.util.TreeSet[java.lang.Long]()
    if (n <= w) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) { val h = hashes.getLong(i); if (h < m) m = h; i += 1 }
      mins.add(m)
    } else {
      // deque of indexes with increasing hash values; head = window min
      val idx = new Array[Int](n)
      var head = 0
      var tail = 0 // exclusive
      var i = 0
      while (i < n) {
        val h = hashes.getLong(i)
        while (tail > head && hashes.getLong(idx(tail - 1)) >= h) tail -= 1
        idx(tail) = i; tail += 1
        if (idx(head) <= i - w) head += 1
        if (i >= w - 1) mins.add(hashes.getLong(idx(head)))
        i += 1
      }
    }
    val out = new Array[Long](mins.size())
    val it = mins.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** k-min signature over 32-bit hashes with the permutation constants. */
  def minhashSignature(hashes: ArrayData, k: Int): ArrayData = {
    val as = MinhashA
    val bs = MinhashB
    val p = MinhashP
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < k) {
        val m = (as(i) * h + bs(i)) % p
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}
