package graft.sinks

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream, InputStream, OutputStream}

import graft.core.CassandraTokens

/**
 * Append-only sorted-run file writer shared by the RDD sink (BulkSink) and
 * the DSv2 sink: `graft-<pid>-Data.db` (2-byte key len + key + 4-byte value
 * len + value) plus a sparse `Index.db` (token, offset every
 * `indexInterval` rows). Enforces the decorated-key sorted-input contract.
 *
 * `compression` takes the reference's `compressionclass` URI option
 * (CassandraParams.java:103-105 — short or fully-qualified Cassandra
 * compressor name) and compresses the DATA stream with the matching JVM
 * codec. Compressed runs get NO Index.db: index offsets are logical
 * (uncompressed) positions, and without a chunk map (Cassandra's
 * CompressionInfo.db) they cannot seek into compressed bytes — emitting
 * one would be a trap for consumers. Compressed runs are a sequential-
 * only format (ADR 0001); the manifest records both logical `bytes`
 * (record stream size, what a re-parse produces) and `physicalBytes`
 * (on-disk size, what a transfer costs).
 *
 * `randomTokens = true` switches the writer to RandomPartitioner mode
 * (the reference serves both partitioners through one writer,
 * CassandraPartitioner.java:46-47): rows arrive keyed by canonical
 * 16-byte md5 tokens via `addRandom`, order is checked in md5
 * decorated-key order, and the manifest carries the token range as hex
 * (`minTokenHex`/`maxTokenHex` — md5 tokens reach 2^127 and overflow the
 * Long fields, which are pinned to the full Murmur3 range so Long-token
 * pruning never wrongly drops a random run). No Index.db is written:
 * the sparse-index format speaks Long tokens and no reader can seek by
 * md5 token yet — an unusable index would be a trap, same reasoning as
 * the compressed carve-out.
 */
final class SortedRunWriter(outDir: String, pid: Int, indexInterval: Int = 128,
    compression: Option[String] = None, randomTokens: Boolean = false) {
  /** Normalized codec id ("none"/"deflate"/"lz4"/"snappy"/"zstd"); fails
    * fast on an unknown compressionclass before any file is created. */
  val codec: String = compression.map(SortedRunWriter.normalizeCodec).getOrElse("none")
  val dataName = f"graft-$pid%05d-Data.db"
  /** Empty for compressed and random-token runs — logical offsets cannot
    * seek into compressed bytes, and the index format speaks Long tokens
    * which md5 tokens overflow; no index file is written at all. */
  val indexName: String =
    if (codec == "none" && !randomTokens) f"graft-$pid%05d-Index.db" else ""
  private val dataFile = new File(outDir, dataName)
  private val indexFile = if (indexName.nonEmpty) new File(outDir, indexName) else null
  private val out = new DataOutputStream(new BufferedOutputStream(
    SortedRunWriter.compress(codec, new FileOutputStream(dataFile)), 1 << 16))
  private val idx = if (indexFile == null) null
    else new DataOutputStream(new BufferedOutputStream(new FileOutputStream(indexFile), 1 << 14))

  private var rows = 0L
  private var offset = 0L
  private var minToken = Long.MaxValue
  private var maxToken = Long.MinValue
  private var prevToken = Long.MinValue
  private var prevKey: Array[Byte] = _
  // random-token mode state: canonical 16-byte md5 tokens
  private var minTokenB: Array[Byte] = _
  private var maxTokenB: Array[Byte] = _
  private var prevTokenB: Array[Byte] = _

  /** Running counters for live progress metrics (DSv2 CustomTaskMetric). */
  def rowsSoFar: Long = rows
  def bytesSoFar: Long = offset
  def minTokenSoFar: Long = minToken
  def maxTokenSoFar: Long = maxToken

  def add(token: Long, key: Array[Byte], value: Array[Byte]): Unit = {
    require(!randomTokens, "random-token writer: use addRandom(tokenBytes, ...)")
    if (prevKey != null &&
        CassandraTokens.compareDecorated(prevToken, prevKey, token, key) > 0)
      throw new IllegalStateException(
        s"partition $pid input not in decorated-key order at row $rows")
    if (idx != null && rows % indexInterval == 0) { idx.writeLong(token); idx.writeLong(offset) }
    writeRecord(key, value)
    if (token < minToken) minToken = token
    if (token > maxToken) maxToken = token
    prevToken = token; prevKey = key
    rows += 1
  }

  /** RandomPartitioner-mode append: `token` is the canonical 16-byte
    * big-endian md5 token (CassandraTokens.md5TokenBytes). */
  def addRandom(token: Array[Byte], key: Array[Byte], value: Array[Byte]): Unit = {
    require(randomTokens, "Murmur3 writer: use add(token, ...)")
    require(token.length == 16, s"md5 token must be 16 bytes, got ${token.length}")
    if (prevKey != null && {
        val c = CassandraTokens.compareUnsigned(prevTokenB, token)
        c > 0 || (c == 0 && CassandraTokens.compareUnsigned(prevKey, key) > 0)
      })
      throw new IllegalStateException(
        s"partition $pid input not in md5 decorated-key order at row $rows")
    writeRecord(key, value)
    if (minTokenB == null || CassandraTokens.compareUnsigned(token, minTokenB) < 0)
      minTokenB = token
    if (maxTokenB == null || CassandraTokens.compareUnsigned(token, maxTokenB) > 0)
      maxTokenB = token
    prevTokenB = token; prevKey = key
    rows += 1
  }

  private def writeRecord(key: Array[Byte], value: Array[Byte]): Unit = {
    out.writeShort(key.length)
    out.write(key)
    out.writeInt(value.length)
    out.write(value)
    offset += 2 + key.length + 4 + value.length
  }

  def close(): BulkSink.PartitionManifest = {
    out.close(); if (idx != null) idx.close()
    if (randomTokens) {
      // Long token fields span the full Murmur3 range so a Long-token
      // consumer treats the run as "could contain anything" (conservative);
      // the real md5 range rides in hex
      def hex(b: Array[Byte]): String =
        if (b == null) "" else b.map(x => f"$x%02x").mkString
      BulkSink.PartitionManifest(pid, rows, offset,
        Long.MinValue, Long.MaxValue,
        sorted = true, dataName, indexName, codec,
        physicalBytes = dataFile.length(),
        minTokenHex = hex(minTokenB), maxTokenHex = hex(maxTokenB))
    } else
      BulkSink.PartitionManifest(pid, rows, offset, minToken, maxToken,
        sorted = true, dataName, indexName, codec,
        physicalBytes = dataFile.length())
  }

  def abort(): Unit = {
    try { out.close(); if (idx != null) idx.close() } catch { case _: Throwable => () }
    dataFile.delete(); if (indexFile != null) indexFile.delete()
    ()
  }
}

object SortedRunWriter {

  /** Reference compressor names -> codec id; rejects anything else LOUDLY
    * (a typo'd compressionclass must not silently write uncompressed). */
  def normalizeCodec(name: String): String =
    name.substring(name.lastIndexOf('.') + 1) match {
      case "DeflateCompressor" | "deflate" => "deflate"
      case "LZ4Compressor" | "lz4"         => "lz4"
      case "SnappyCompressor" | "snappy"   => "snappy"
      case "ZstdCompressor" | "zstd"       => "zstd"
      case "none"                          => "none"
      case _ => throw new IllegalArgumentException(
        s"unsupported compressionclass '$name' (supported: DeflateCompressor, " +
          "LZ4Compressor, SnappyCompressor, ZstdCompressor)")
    }

  /** Wrap a raw file stream in the codec's compressor (lz4/snappy/zstd
    * ship in Spark's own jars; deflate is java.util.zip). */
  def compress(codec: String, os: OutputStream): OutputStream = codec match {
    case "none"    => os
    case "deflate" => new java.util.zip.DeflaterOutputStream(
      os, new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION), 1 << 16)
    case "lz4"     => new net.jpountz.lz4.LZ4BlockOutputStream(os, 1 << 16)
    case "snappy"  => new org.xerial.snappy.SnappyOutputStream(os, 1 << 16)
    case "zstd"    => new com.github.luben.zstd.ZstdOutputStream(os)
    case other     => throw new IllegalArgumentException(s"unknown codec id '$other'")
  }

  /** Matching reader side, for run consumers and round-trip tests. */
  def decompress(codec: String, is: InputStream): InputStream = codec match {
    case "none"    => is
    case "deflate" => new java.util.zip.InflaterInputStream(is)
    case "lz4"     => new net.jpountz.lz4.LZ4BlockInputStream(is)
    case "snappy"  => new org.xerial.snappy.SnappyInputStream(is)
    case "zstd"    => new com.github.luben.zstd.ZstdInputStream(is)
    case other     => throw new IllegalArgumentException(s"unknown codec id '$other'")
  }
}
