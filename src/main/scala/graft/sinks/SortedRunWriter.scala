package graft.sinks

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream}

import graft.core.CassandraTokens

/**
 * Append-only sorted-run file writer shared by the RDD sink (BulkSink) and
 * the DSv2 sink: `graft-<pid>-Data.db` (2-byte key len + key + 4-byte value
 * len + value) plus a sparse `Index.db` (token, offset every
 * `indexInterval` rows). Enforces the decorated-key sorted-input contract.
 */
final class SortedRunWriter(outDir: String, pid: Int, indexInterval: Int = 128) {
  val dataName = f"graft-$pid%05d-Data.db"
  val indexName = f"graft-$pid%05d-Index.db"
  private val dataFile = new File(outDir, dataName)
  private val indexFile = new File(outDir, indexName)
  private val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(dataFile), 1 << 16))
  private val idx = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(indexFile), 1 << 14))

  private var rows = 0L
  private var offset = 0L
  private var minToken = Long.MaxValue
  private var maxToken = Long.MinValue
  private var prevToken = Long.MinValue
  private var prevKey: Array[Byte] = _

  /** Running counters for live progress metrics (DSv2 CustomTaskMetric). */
  def rowsSoFar: Long = rows
  def bytesSoFar: Long = offset
  def minTokenSoFar: Long = minToken
  def maxTokenSoFar: Long = maxToken

  def add(token: Long, key: Array[Byte], value: Array[Byte]): Unit = {
    if (prevKey != null &&
        CassandraTokens.compareDecorated(prevToken, prevKey, token, key) > 0)
      throw new IllegalStateException(
        s"partition $pid input not in decorated-key order at row $rows")
    if (rows % indexInterval == 0) { idx.writeLong(token); idx.writeLong(offset) }
    out.writeShort(key.length)
    out.write(key)
    out.writeInt(value.length)
    out.write(value)
    offset += 2 + key.length + 4 + value.length
    if (token < minToken) minToken = token
    if (token > maxToken) maxToken = token
    prevToken = token; prevKey = key
    rows += 1
  }

  def close(): BulkSink.PartitionManifest = {
    out.close(); idx.close()
    BulkSink.PartitionManifest(pid, rows, offset, minToken, maxToken,
      sorted = true, dataName, indexName)
  }

  def abort(): Unit = {
    try { out.close(); idx.close() } catch { case _: Throwable => () }
    dataFile.delete(); indexFile.delete()
    ()
  }
}
