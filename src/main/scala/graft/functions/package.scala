package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

/**
 * Column-level API over the custom Catalyst expressions, mirroring
 * org.apache.spark.sql.functions style.
 */
package object functions {

  private def col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    Bridge.column(e)

  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    Bridge.expression(c)

  /** Murmur3Partitioner token of partition-key bytes (binary -> long). */
  def cassandra_token(key: Column): Column = col(CassandraTokenExpr(expr(key)))

  /** Contiguous ring bucket 0..n-1 of a token (long -> int). */
  def token_bucket(token: Column, numBuckets: Int): Column =
    col(TokenBucketExpr(expr(token), numBuckets))

  /** RandomPartitioner token of partition-key bytes (binary -> 16-byte binary). */
  def cassandra_random_token(key: Column): Column = col(RandomTokenExpr(expr(key)))

  /** Contiguous ring bucket 0..n-1 of a RandomPartitioner token. */
  def random_token_bucket(token: Column, numBuckets: Int): Column =
    col(RandomTokenBucketExpr(expr(token), numBuckets))

  /** Serialize a scalar value to Cassandra wire bytes (null -> empty). */
  def cql_serialize(value: Column): Column = col(CqlSerializeExpr(expr(value)))

  /** CompositeType encoding of 2+ pre-serialized key components. */
  def composite_key(components: Column*): Column =
    col(CompositeKeyExpr(components.map(expr)))

  /** Double-precision dot product of two numeric arrays (codegen'd). */
  def vec_dot(a: Column, b: Column): Column = col(VectorDotExpr(expr(a), expr(b)))

  /** Product-quantization codes of a vector against a plan-time codebook
    * (`codebook(sub)(code)` = codeword vector). */
  def pq_encode(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    col(PqEncodeExpr(expr(vec), codebook))

  /** Morton (Z-order) interleave of 2..6 bigint dimensions — the
    * multi-column clustering key for data skipping. */
  def z_order(dims: Column*): Column =
    col(ZOrderExpr(dims.map(expr)))

  /** 32-bit md5-derived hash per shingle (codegen'd). */
  def shingle_hashes(shingles: Column): Column = col(ShingleHashesExpr(expr(shingles)))

  /** k-min MinHash signature over shingle hashes (codegen'd). */
  def minhash_signature(hashes: Column, k: Int): Column =
    col(MinHashSignatureExpr(expr(hashes), k))

  /** Sorted distinct winnowing fingerprints over k-gram hashes (codegen'd). */
  def winnow(hashes: Column, w: Int): Column = col(WinnowExpr(expr(hashes), w))

  /** Count of regex matches (no match materialization; codegen'd). */
  def match_count(str: Column, pattern: String): Column =
    col(RegexpCountExpr(expr(str), pattern))

  /** 32-bit hash per overlapping char k-gram, fused — no gram strings. */
  def char_gram_hashes(str: Column, k: Int): Column =
    col(CharGramHashesExpr(expr(str), k))

  /** Count of array<string> elements in a constant word set (codegen'd). */
  def array_count_in(arr: Column, words: Seq[String]): Column =
    col(ArrayCountInExpr(expr(arr), words))

  /** Order-insensitive md5 fingerprint of a string set (codegen'd). */
  def set_fingerprint(arr: Column): Column = col(SetFingerprintExpr(expr(arr)))

  /** Count of the most frequent element of array<string> (codegen'd, in-row). */
  def max_token_count(arr: Column): Column = col(MaxTokenCountExpr(expr(arr)))

  /** In-row SimHash signature of array<string> tokens (codegen'd). */
  def simhash_tokens(arr: Column, bits: Int): Column = col(SimhashExpr(expr(arr), bits))

  /** Sum of array<bigint> (codegen'd; null elements skipped). */
  def array_sum_long(arr: Column): Column = col(ArraySumLongExpr(expr(arr)))

  /** |distinct ∩| of two ASC-sorted arrays (two-pointer, codegen'd) —
    * `size(array_intersect(a, b))` without materializing the array. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    col(SortedIntersectCountExpr(expr(a), expr(b)))

  /** Delta-varint pack of an ASC-sorted null-free long/int array into
    * binary (codegen'd) — the exchange-compact adjacency-list form
    * [[packed_intersect_count]] consumes. */
  def pack_sorted_longs(arr: Column): Column =
    col(PackSortedLongsExpr(expr(arr)))

  /** |distinct ∩| of two pack_sorted_longs sets over the encoded bytes
    * (codegen'd) — sorted_intersect_count without unpacking. */
  def packed_intersect_count(a: Column, b: Column): Column =
    col(PackedIntersectCountExpr(expr(a), expr(b)))

  /** Inverse of [[pack_sorted_longs]]: binary -> array<bigint>
    * (codegen'd) — for fanning a packed list back out into rows. */
  def unpack_sorted_longs(blob: Column): Column =
    col(UnpackSortedLongsExpr(expr(blob)))

  /** Distinct overlapping word n-grams (codegen'd byte-level pass). */
  def word_grams(s: Column, n: Int): Column = col(WordGramsExpr(expr(s), n))

  /** First-occurrence line dedup, order-preserving (codegen'd, O(lines)). */
  def dedup_lines(s: Column): Column = col(DedupLinesExpr(expr(s)))

  /** Shannon entropy (bits) of a string's code points (codegen'd). */
  def char_entropy(s: Column): Column = col(CharEntropyExpr(expr(s)))

  def dup_gram_chars(s: Column, n: Int): Column = col(DupGramCharsExpr(expr(s), n))

  /** Bloom-blob membership probe (blob, string) -> boolean (codegen'd). */
  def bloom_contains(blob: Column, item: Column): Column =
    col(BloomContainsExpr(expr(blob), expr(item)))

  /** True when ANY array<string> element probes a bloom blob positive. */
  def bloom_any(blob: Column, arr: Column): Column =
    col(BloomAnyExpr(expr(blob), expr(arr)))

  /** Full partition-key bytes from typed key columns (1 -> raw, 2+ -> composite). */
  def partition_key(keyCols: Column*): Column = {
    require(keyCols.nonEmpty, "partition_key needs at least one column")
    if (keyCols.length == 1) cql_serialize(keyCols.head)
    else composite_key(keyCols.map(cql_serialize): _*)
  }
}
