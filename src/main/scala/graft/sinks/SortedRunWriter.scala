package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream, InputStream, OutputStream}

import graft.core.CassandraTokens

/**
 * Append-only sorted-run file writer shared by the RDD sink (BulkSink) and
 * the DSv2 sink: `graft-<pid>-Data.db` (2-byte key len + key + 4-byte value
 * len + value) plus a sparse `Index.db` (token, logical offset every
 * `indexInterval` rows). Enforces the decorated-key sorted-input contract.
 *
 * `compression` takes the reference's `compressionclass` URI option
 * (CassandraParams.java:103-105 — short or fully-qualified Cassandra
 * compressor name). Compressed runs are CHUNKED, mirroring Cassandra's
 * CompressedSequentialWriter + CompressionInfo.db: the logical record
 * stream is cut into fixed-size chunks, each compressed INDEPENDENTLY and
 * appended to Data.db, and `graft-<pid>-Chunks.db` records one
 * (logicalOffset, physicalOffset) pair per chunk. Independent chunks make
 * logical offsets seekable again — binary-search the chunk map, start
 * decompressing at the chunk's physical offset — so compressed runs now
 * carry the same sparse Index.db as uncompressed ones, and both the
 * graft-bulk read path and the stream loader can serve a token band of a
 * compressed run without inflating it from byte zero. The manifest
 * records both logical `bytes` (record stream size, what a re-parse
 * produces) and `physicalBytes` (on-disk size, what a transfer costs).
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
 * md5 token yet — an unusable index would be a trap.
 */
final class SortedRunWriter(outDir: String, pid: Int, indexInterval: Int = 128,
    compression: Option[String] = None, randomTokens: Boolean = false,
    chunkSize: Int = SortedRunWriter.DefaultChunkSize) {
  require(chunkSize >= 1024, s"chunk size must be >= 1 KiB, got $chunkSize")
  /** Normalized codec id ("none"/"deflate"/"lz4"/"snappy"/"zstd"); fails
    * fast on an unknown compressionclass before any file is created. */
  val codec: String = compression.map(SortedRunWriter.normalizeCodec).getOrElse("none")
  val dataName = f"graft-$pid%05d-Data.db"
  /** Empty for random-token runs — the index format speaks Long tokens,
    * which md5 tokens overflow. Compressed runs DO carry an index: the
    * chunk map makes its logical offsets seekable. */
  val indexName: String = if (!randomTokens) f"graft-$pid%05d-Index.db" else ""
  /** Chunk-map sidecar, compressed runs only (CompressionInfo.db analog). */
  val chunksName: String = if (codec != "none") f"graft-$pid%05d-Chunks.db" else ""
  private val dataFile = new File(outDir, dataName)
  private val indexFile = if (indexName.nonEmpty) new File(outDir, indexName) else null
  private val chunksFile = if (chunksName.nonEmpty) new File(outDir, chunksName) else null

  // codec == none: records append straight to the data stream.
  // otherwise: records accumulate in chunkBuf; every `chunkSize` logical
  // bytes the buffer compresses INDEPENDENTLY and flushes to the file,
  // with its (logical, physical) start recorded for the chunk map.
  private val rawOut = new FileOutputStream(dataFile)
  private val directOut =
    if (codec == "none") new DataOutputStream(new BufferedOutputStream(rawOut, 1 << 16))
    else null
  private val chunkBuf = if (codec == "none") null else new ByteArrayOutputStream(chunkSize + 4096)
  private val chunkDataOut = if (chunkBuf == null) null else new DataOutputStream(chunkBuf)
  private val chunkPairs = if (codec == "none") null else scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
  private var physicalOffset = 0L
  private var chunkLogicalStart = 0L

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
    val out = if (directOut != null) directOut else chunkDataOut
    out.writeShort(key.length)
    out.write(key)
    out.writeInt(value.length)
    out.write(value)
    offset += 2 + key.length + 4 + value.length
    if (chunkBuf != null && chunkBuf.size() >= chunkSize) flushChunk()
  }

  /** Compress the buffered logical chunk independently and append it. */
  private def flushChunk(): Unit = {
    if (chunkBuf.size() == 0) return
    chunkPairs += ((chunkLogicalStart, physicalOffset))
    val compressed = new ByteArrayOutputStream(chunkBuf.size() / 2 + 64)
    val cs = SortedRunWriter.compress(codec, compressed)
    chunkBuf.writeTo(cs)
    cs.close()
    val bytes = compressed.toByteArray
    rawOut.write(bytes)
    physicalOffset += bytes.length
    chunkLogicalStart += chunkBuf.size()
    chunkBuf.reset()
  }

  /** Chunk-map entry count recorded in the manifest: 0 for uncompressed
    * runs, the number of independently-compressed chunks otherwise —
    * readers use a positive count to REQUIRE the Chunks.db sidecar. */
  private def chunkCount: Int = if (chunkPairs == null) 0 else chunkPairs.length

  def close(): BulkSink.PartitionManifest = {
    if (directOut != null) directOut.close()
    else {
      flushChunk()
      rawOut.close()
      val cm = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(chunksFile), 1 << 14))
      chunkPairs.foreach { case (lo, po) => cm.writeLong(lo); cm.writeLong(po) }
      cm.close()
    }
    if (idx != null) idx.close()
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
        minTokenHex = hex(minTokenB), maxTokenHex = hex(maxTokenB),
        chunks = chunkCount)
    } else
      BulkSink.PartitionManifest(pid, rows, offset, minToken, maxToken,
        sorted = true, dataName, indexName, codec,
        physicalBytes = dataFile.length(), chunks = chunkCount)
  }

  def abort(): Unit = {
    try {
      if (directOut != null) directOut.close() else rawOut.close()
      if (idx != null) idx.close()
    } catch { case _: Throwable => () }
    dataFile.delete()
    if (indexFile != null) indexFile.delete()
    if (chunksFile != null) chunksFile.delete()
    ()
  }
}

object SortedRunWriter {

  /** Logical chunk size for compressed runs — Cassandra's default
    * chunk_length (64 KiB) order of magnitude: big enough to compress
    * well, small enough that a token-band seek skips most of a run. */
  val DefaultChunkSize: Int = 64 * 1024

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

  /** Wrap a raw stream in the codec's compressor (lz4/snappy/zstd
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

  /** Chunk map of a compressed run: (logicalOffset, physicalOffset) per
    * chunk, ascending. Empty for a missing file (not-chunked legacy). */
  def readChunks(chunksFile: File): Array[(Long, Long)] = {
    if (!chunksFile.exists()) return Array.empty
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(chunksFile), 1 << 14))
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var done = false
      while (!done) {
        try buf += ((in.readLong(), in.readLong()))
        catch { case _: EOFException => done = true }
      }
      buf.toArray
    } finally in.close()
  }

  /** Conventional chunk-map sidecar for a Data.db path. */
  def chunksFileFor(dataFile: File): File =
    new File(dataFile.getParentFile, dataFile.getName.replace("-Data.db", "-Chunks.db"))

  /**
   * Shared framing rules for a chunk map against its physical byte
   * count — ONE implementation serving both the disk path
   * (validateChunks, throws) and StreamLoader's wire path (protocol
   * error reply), so the two can never silently diverge. Returns the
   * first violation, or None for a well-framed map. An empty map is a
   * violation whenever physical bytes exist: compressed payload with no
   * chunk boundaries cannot be framed.
   */
  def chunkFramingError(chunks: Array[(Long, Long)], physTotal: Long): Option[String] = {
    val maxChunk = 1L << 30 // no sane chunk compresses to > 1 GiB
    if (physTotal < 0) return Some(s"negative physical total $physTotal")
    if (chunks.isEmpty)
      return if (physTotal == 0) None
      else Some(s"empty chunk map for $physTotal physical bytes")
    if (chunks(0)._1 != 0) return Some(s"first logical offset ${chunks(0)._1} != 0")
    if (chunks(0)._2 < 0) return Some(s"negative first physical offset ${chunks(0)._2}")
    var k = 0
    while (k < chunks.length) {
      val physEnd = if (k + 1 < chunks.length) chunks(k + 1)._2 else physTotal
      val len = physEnd - chunks(k)._2
      if (len <= 0 || len > maxChunk)
        return Some(s"chunk $k has physical extent $len " +
          s"(offsets ${chunks(k)._2} -> $physEnd)")
      if (k > 0 && chunks(k)._1 <= chunks(k - 1)._1)
        return Some(s"chunk $k logical offset ${chunks(k)._1} not ascending")
      k += 1
    }
    None
  }

  /**
   * Validate a disk-loaded chunk map against its data file's physical
   * length — a corrupt, foreign, or empty-but-bytes-present sidecar must
   * fail as LOUDLY as a missing one (naming the file), not mis-frame
   * chunk boundaries into a huge allocation or a silently garbled
   * decompress.
   */
  def validateChunks(chunksFile: File, chunks: Array[(Long, Long)],
      physTotal: Long): Unit =
    chunkFramingError(chunks, physTotal).foreach { msg =>
      throw new IllegalStateException(
        s"corrupt chunk sidecar $chunksFile: $msg — restore the sidecar or " +
          "rewrite the run")
    }

  /**
   * Open a chunked compressed run as its LOGICAL stream starting at the
   * last chunk whose logical offset is <= `startLogical` — the caller
   * still skips `startLogical - <returned logical start>` bytes. Chunks
   * decompress independently and chain transparently; chunk k's physical
   * extent is bounded by chunk k+1's physical offset (the file length for
   * the last chunk). Reads only the physical bytes from the seek point on.
   */
  def openChunked(dataFile: File, codec: String, chunks: Array[(Long, Long)],
      startLogical: Long): (InputStream, Long) = {
    require(chunks.nonEmpty, s"no chunk map for $dataFile")
    var k = 0
    while (k + 1 < chunks.length && chunks(k + 1)._1 <= startLogical) k += 1
    val raw = new FileInputStream(dataFile)
    raw.getChannel.position(chunks(k)._2)
    val fileLen = dataFile.length()
    val startChunk = k
    val stream: InputStream = new InputStream {
      private var cur: InputStream = _
      private var chunkIdx = startChunk
      private val buffered = new BufferedInputStream(raw, 1 << 16)
      private def nextChunk(): Boolean = {
        if (chunkIdx >= chunks.length) return false
        val physStart = chunks(chunkIdx)._2
        val physEnd = if (chunkIdx + 1 < chunks.length) chunks(chunkIdx + 1)._2 else fileLen
        val len = (physEnd - physStart).toInt
        val buf = new Array[Byte](len)
        var read = 0
        while (read < len) {
          val n = buffered.read(buf, read, len - read)
          if (n < 0) throw new EOFException(s"truncated chunk $chunkIdx in $dataFile")
          read += n
        }
        cur = decompress(codec, new ByteArrayInputStream(buf))
        chunkIdx += 1
        true
      }
      override def read(): Int = {
        while (true) {
          if (cur == null && !nextChunk()) return -1
          val b = cur.read()
          if (b >= 0) return b
          cur.close(); cur = null
        }
        -1 // unreachable
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        while (true) {
          if (cur == null && !nextChunk()) return -1
          val n = cur.read(b, off, len)
          if (n > 0) return n
          cur.close(); cur = null
        }
        -1 // unreachable
      }
      override def close(): Unit = { if (cur != null) cur.close(); buffered.close() }
    }
    (stream, chunks(startChunk)._1)
  }
}
