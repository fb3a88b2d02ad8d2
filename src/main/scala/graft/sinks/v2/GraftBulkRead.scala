package graft.sinks.v2

import java.io.{BufferedInputStream, DataInputStream, EOFException, File, FileInputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.core.CassandraTokens
import graft.sinks.BulkSink

/**
 * Read path for the graft-bulk sorted-run format: each Data.db file is one
 * InputPartition (files are independent sorted runs, so parallelism =
 * partition count of the original load) streaming (token, pk, value) rows.
 * Lets a distributed verification or repair job re-scan a bulk load
 * without any driver-side file handling.
 *
 * Token predicates PUSH DOWN, the per-range read the reference's loader
 * does with per-range file sections (ExternalSSTableLoaderClient.java:
 * 57-137 supplies ranges; streamSSTables sends only matching sections):
 *  - the manifest's [minToken, maxToken] prunes whole runs;
 *  - the sparse Index.db seeks past the leading bytes of an uncompressed
 *    run (offset of the last entry strictly below the bound);
 *  - runs are token-sorted, so every reader early-stops past the upper
 *    bound (compressed runs too — they just can't seek, ADR 0001).
 * Filters stay residual: Spark re-evaluates them, pruning is best-effort.
 *
 * Columns PRUNE too: value payloads (the bulk of every record) are skipped
 * in the stream, never allocated, when the query does not read `value` —
 * a count or token histogram over a bulk directory touches only framing.
 */
object GraftBulkRead {
  val schema: StructType = StructType(Seq(
    StructField("token", LongType, nullable = false),
    StructField("pk", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false)))

  /** One planned file read: start at `startOffset` (0 unless an index
    * seek applies), stop after the first token above `hiBound`. */
  final case class PlannedSplit(file: String, codec: String,
      startOffset: Long, hiBound: Long)

  /** Plan the splits a scan needs given an optional token range [lo, hi],
    * both inclusive. Files without a manifest entry (pre-manifest dirs)
    * full-scan uncompressed. */
  def planSplits(dir: File, lo: Option[Long], hi: Option[Long]): Seq[PlannedSplit] = {
    val manifests = BulkSink.readManifests(dir).map(m => m.dataFile -> m).toMap
    val hiBound = hi.getOrElse(Long.MaxValue)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith("-Data.db")).sortBy(_.getName)
    files.iterator.flatMap { f =>
      manifests.get(f.getName) match {
        case Some(m) =>
          if (m.rows == 0 || lo.exists(_ > m.maxToken) || hi.exists(_ < m.minToken)) None
          else {
            val start = lo match {
              case Some(l) if m.codec == "none" && m.indexFile.nonEmpty =>
                indexSeek(new File(dir, m.indexFile), l)
              case _ => 0L
            }
            // RandomPartitioner runs (hex token range in the manifest) are
            // md5-sorted, NOT murmur3-sorted: the reader's early-stop on
            // recomputed murmur3 tokens would truncate them mid-file, so
            // they always read to EOF (their Long range is pinned full-ring,
            // so the bounds above never prune them either)
            val effectiveHi = if (m.minTokenHex.nonEmpty) Long.MaxValue else hiBound
            Some(PlannedSplit(f.getAbsolutePath, m.codec, start, effectiveHi))
          }
        case None => Some(PlannedSplit(f.getAbsolutePath, "none", 0L, hiBound))
      }
    }.toSeq
  }

  /**
   * Offset of the LAST sparse-index entry with token strictly below `lo`.
   * Rows before that entry all have token <= its token < lo, so starting
   * there cannot drop a match; strictness matters because rows equal to
   * an entry's token can precede the entry.
   */
  private def indexSeek(idxFile: File, lo: Long): Long = {
    if (!idxFile.exists()) return 0L
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(idxFile), 1 << 14))
    try {
      var best = 0L
      var done = false
      while (!done) {
        try {
          val tok = in.readLong()
          val off = in.readLong()
          if (tok < lo) best = off else done = true
        } catch { case _: EOFException => done = true }
      }
      best
    } finally in.close()
  }
}

final class GraftBulkScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Option[Long] = None // inclusive
  private var hi: Option[Long] = None // inclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftBulkRead.schema

  // column pruning: a count or token histogram over a bulk directory must
  // not materialize the value payloads (the bulk of every record's bytes —
  // the reader SKIPS them instead of allocating + copying)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def raiseLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
  private def lowerHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = filters.filter {
      case GreaterThan("token", _: Long) | GreaterThanOrEqual("token", _: Long) |
           LessThan("token", _: Long) | LessThanOrEqual("token", _: Long) |
           EqualTo("token", _: Long) => true
      case _ => false
    }
    usable.foreach {
      // saturate at the extremes instead of overflowing; the (weaker)
      // bound is still safe because filters stay residual
      case GreaterThan("token", v: Long) =>
        raiseLo(if (v == Long.MaxValue) v else v + 1)
      case GreaterThanOrEqual("token", v: Long) => raiseLo(v)
      case LessThan("token", v: Long) =>
        lowerHi(if (v == Long.MinValue) v else v - 1)
      case LessThanOrEqual("token", v: Long) => lowerHi(v)
      case EqualTo("token", v: Long)         => raiseLo(v); lowerHi(v)
      case _                                 => ()
    }
    pushed = usable
    filters // all residual — Spark re-applies every filter after the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch with SupportsReportStatistics {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] =
      GraftBulkRead.planSplits(new File(path), lo, hi)
        .map(s => GraftBulkInputPartition(s.file, s.codec, s.startOffset,
          s.hiBound): InputPartition)
        .toArray

    // manifest-derived estimates AFTER token pruning, so Catalyst can
    // broadcast a narrowly-filtered bulk read into a join instead of
    // shuffling both sides (logical bytes: what the scan produces)
    override def estimateStatistics(): Statistics = {
      val planned = GraftBulkRead.planSplits(new File(path), lo, hi)
        .map(s => new File(s.file).getName).toSet
      val ms = BulkSink.readManifests(new File(path)).filter(m => planned(m.dataFile))
      if (ms.isEmpty) new Statistics {
        override def sizeInBytes() = java.util.OptionalLong.empty()
        override def numRows() = java.util.OptionalLong.empty()
      } else new Statistics {
        override def sizeInBytes() = java.util.OptionalLong.of(ms.map(_.bytes).sum)
        override def numRows() = java.util.OptionalLong.of(ms.map(_.rows).sum)
      }
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftBulkReaderFactory(required.fieldNames)
  }
}

final case class GraftBulkInputPartition(file: String, codec: String,
    startOffset: Long = 0L, hiBound: Long = Long.MaxValue) extends InputPartition

final class GraftBulkReaderFactory(columns: Array[String] = GraftBulkRead.schema.fieldNames)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBulkInputPartition]
    new GraftBulkPartitionReader(p.file, p.codec, p.startOffset, p.hiBound, columns)
  }
}

final class GraftBulkPartitionReader(file: String, codec: String = "none",
    startOffset: Long = 0L, hiBound: Long = Long.MaxValue,
    columns: Array[String] = GraftBulkRead.schema.fieldNames)
    extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(new BufferedInputStream(
    graft.sinks.SortedRunWriter.decompress(codec, new FileInputStream(file)), 1 << 16))
  if (startOffset > 0) in.skipNBytes(startOffset) // logical offsets: uncompressed runs only
  // the value payload is the bulk of a record's bytes; when pruned away it
  // is SKIPPED in the stream, never allocated (the key must always be read
  // to advance the frame, and it feeds the early-stop token anyway)
  private val needValue = columns.contains("value")
  private var current: InternalRow = _

  override def next(): Boolean = {
    try {
      val klen = in.readUnsignedShort()
      val key = new Array[Byte](klen); in.readFully(key)
      val vlen = in.readInt()
      val value = if (needValue) {
        val v = new Array[Byte](vlen); in.readFully(v); v
      } else { in.skipNBytes(vlen.toLong); null }
      val token = CassandraTokens.token(key)
      // runs are token-sorted: past the upper bound nothing else matches
      if (token > hiBound) false
      else {
        current = new GenericInternalRow(columns.map[Any] {
          case "token" => token
          case "pk"    => key
          case "value" => value
        })
        true
      }
    } catch { case _: EOFException => false }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
