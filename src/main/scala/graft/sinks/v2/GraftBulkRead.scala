package graft.sinks.v2

import java.io.{BufferedInputStream, DataInputStream, EOFException, File, FileInputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.core.CassandraTokens
import graft.sinks.BulkSink

/**
 * Read path for the graft-bulk sorted-run format: each Data.db file is one
 * InputPartition (files are independent sorted runs, so parallelism =
 * partition count of the original load) streaming (token, pk, value,
 * bucket) rows. Lets a distributed verification or repair job re-scan a
 * bulk load without any driver-side file handling.
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
 *
 * The scan DECLARES what the format guarantees, so Catalyst plans around
 * re-reads instead of re-shuffling perfectly-placed data:
 *  - SupportsReportOrdering: every split is one decorated-key-sorted run,
 *    so per-partition output ordering is (token ASC, pk ASC) — a write
 *    that requires that ordering plans no Sort over it;
 *  - SupportsReportPartitioning: every row of a split shares the split's
 *    `bucket` (the originating ring slot), reported as key-grouped
 *    partitioning on the `bucket` column (each split carries its key via
 *    HasPartitionKey) — with spark.sql.sources.v2.bucketing.enabled a
 *    per-run aggregation plans no Exchange. The ring-bucket FUNCTION
 *    itself (unsigned token ranges + slot permutation) is not a Catalyst
 *    partitioning, so token-derived clusterings still exchange; the
 *    bucket column is the declared, checkable surface;
 *  - SupportsRuntimeFiltering: a broadcast join's actual token values
 *    narrow the split plan at execution time (per-run IN-set pruning);
 *  - LIMIT and ORDER-BY-token-LIMIT plan only the runs needed to cover
 *    the limit (token order exploits disjoint-verified ring ranges).
 */
object GraftBulkRead {
  val schema: StructType = StructType(Seq(
    StructField("token", LongType, nullable = false),
    StructField("pk", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))

  /** One planned file read: start at `startOffset` (0 unless an index
    * seek applies), stop after the first token above `hiBound`.
    * `estRows`/`estBytes` pro-rate the manifest totals to the pushed
    * token band via the sparse index (whole-run totals when no index
    * can narrow them); `bucket` is the originating ring slot (-1 when
    * unknown: pre-manifest dirs with unparseable names); `minToken`/
    * `maxToken` echo the manifest range for set-pruning consumers. */
  final case class PlannedSplit(file: String, codec: String,
      startOffset: Long, hiBound: Long, bucket: Int = -1,
      estRows: Long = 0L, estBytes: Long = 0L,
      minToken: Long = Long.MinValue, maxToken: Long = Long.MaxValue,
      chunked: Boolean = false, totalBytes: Long = -1L)

  private val RunNameRe = """graft-(\d+)-Data\.db""".r

  /**
   * Plan the splits a scan needs given an optional token range [lo, hi],
   * both inclusive. Files without a manifest entry (pre-manifest dirs)
   * full-scan uncompressed — and are never early-stopped: with no
   * manifest there is no evidence of murmur3 sort order, and stopping an
   * md5-sorted (or unsorted) file at the first out-of-band murmur3 token
   * would silently drop rows. ONE manifest read and at most one index
   * read per run serve pruning, seeking, and statistics alike;
   * `preRead` lets a caller that already parsed the manifest share it.
   */
  def planSplits(dir: File, lo: Option[Long], hi: Option[Long],
      preRead: Option[Seq[BulkSink.PartitionManifest]] = None): Seq[PlannedSplit] = {
    val manifests = preRead.getOrElse(BulkSink.readManifests(dir))
      .map(m => m.dataFile -> m).toMap
    val hiBound = hi.getOrElse(Long.MaxValue)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith("-Data.db")).sortBy(_.getName)
    def bucketOf(name: String): Int = name match {
      case RunNameRe(pid) => pid.toInt
      case _              => -1
    }
    files.iterator.flatMap { f =>
      manifests.get(f.getName) match {
        case Some(m) =>
          if (m.rows == 0 || lo.exists(_ > m.maxToken) || hi.exists(_ < m.minToken)) None
          else {
            // the whole run is inside the band -> totals are exact, no
            // index read needed; otherwise one index pass yields both the
            // seek offset and the in-band entry fraction
            // the sparse index speaks LOGICAL offsets; they seek direct
            // into uncompressed runs and through the chunk map into
            // compressed ones (the reader resolves the chunk), so any
            // indexed run narrows here
            val bandCovers =
              lo.forall(_ <= m.minToken) && hi.forall(_ >= m.maxToken)
            val (start, estRows, estBytes) =
              if (bandCovers) (0L, m.rows, m.bytes)
              else if (m.indexFile.nonEmpty) {
                val (off, frac) = indexSeekAndFraction(
                  new File(dir, m.indexFile), lo, hi.filter(_ != Long.MaxValue))
                (if (lo.isDefined) off else 0L,
                  math.max(1L, math.ceil(m.rows * frac).toLong),
                  math.max(1L, math.ceil(m.bytes * frac).toLong))
              } else (0L, m.rows, m.bytes)
            // RandomPartitioner runs (hex token range in the manifest) are
            // md5-sorted, NOT murmur3-sorted: the reader's early-stop on
            // recomputed murmur3 tokens would truncate them mid-file, so
            // they always read to EOF (their Long range is pinned full-ring,
            // so the bounds above never prune them either)
            val effectiveHi = if (m.minTokenHex.nonEmpty) Long.MaxValue else hiBound
            Some(PlannedSplit(f.getAbsolutePath, m.codec, start, effectiveHi,
              m.partition, estRows, estBytes, m.minToken, m.maxToken,
              chunked = m.chunks > 0, totalBytes = m.bytes))
          }
        case None =>
          Some(PlannedSplit(f.getAbsolutePath, "none", 0L, Long.MaxValue,
            bucketOf(f.getName), estRows = 0L, estBytes = f.length()))
      }
    }.toSeq
  }

  /** True when EVERY Data.db in the directory has a manifest entry and
    * every entry is a Murmur3 run: md5-sorted RandomPartitioner runs are
    * not token-sorted for the reader, and a file WITHOUT a manifest has
    * no evidence of order at all — claiming ordering over either would
    * let Spark elide sorts over unordered data. */
  def murmur3Sorted(dir: File,
      preRead: Option[Seq[BulkSink.PartitionManifest]] = None): Boolean = {
    val ms = preRead.getOrElse(BulkSink.readManifests(dir))
    val manifested = ms.map(_.dataFile).toSet
    ms.nonEmpty && ms.forall(_.minTokenHex.isEmpty) &&
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith("-Data.db")).forall(f => manifested(f.getName))
  }

  /**
   * One pass over a sparse index: the seek offset (offset of the LAST
   * entry with token strictly below `lo` — rows before it all have
   * token <= its token < lo, so starting there cannot drop a match;
   * strictness matters because rows equal to an entry's token can
   * precede the entry) and the fraction of entries inside [lo, hi]
   * (with one neighbor on each open side, since rows between two
   * entries can still match — keeps the estimate an over- not
   * under-count at index granularity).
   */
  private def indexSeekAndFraction(idxFile: File, lo: Option[Long],
      hi: Option[Long]): (Long, Double) = {
    if (!idxFile.exists()) return (0L, 1.0)
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(idxFile), 1 << 14))
    try {
      var best = 0L
      var total = 0L
      var within = 0L
      var sawBelow = false // an entry below lo exists -> count one neighbor
      var sawAbove = false
      val loB = lo.getOrElse(Long.MinValue)
      val hiB = hi.getOrElse(Long.MaxValue)
      var done = false
      while (!done) {
        try {
          val tok = in.readLong()
          val off = in.readLong()
          total += 1
          if (tok < loB) { best = off; sawBelow = true }
          if (tok >= loB && tok <= hiB) within += 1
          if (tok > hiB) sawAbove = true
        } catch { case _: EOFException => done = true }
      }
      val bounded = within + (if (sawBelow) 1L else 0L) + (if (sawAbove) 1L else 0L)
      val frac = if (total == 0) 1.0 else math.min(1.0, bounded.toDouble / total)
      (best, frac)
    } finally in.close()
  }
}

final class GraftBulkScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo: Option[Long] = None // inclusive
  private var hi: Option[Long] = None // inclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftBulkRead.schema
  private var limit: Option[Int] = None
  private var topN: Option[Boolean] = None // Some(desc) when ORDER BY token

  /** LIMIT n: plan only enough runs to cover n rows (manifest row counts
    * are exact), instead of opening every run of a huge load for a peek.
    * Returns false — Spark still applies the limit for exactness. */
  override def pushLimit(n: Int): Boolean = {
    limit = Some(n)
    false
  }

  /** ORDER BY token [ASC|DESC] LIMIT n: ring-aligned runs have DISJOINT
    * token ranges, so the n globally-smallest (or largest) tokens live in
    * a prefix (suffix) of the runs ordered by range — plan only that.
    * Applied at plan time only when the directory's ranges verify
    * disjoint; Spark still sorts and limits (returns false). Orderings
    * not led by the token column push nothing.
    */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    orders.headOption.collect {
      case o if o.expression() == Expressions.column("token") ||
        o.expression().toString == "token" => o.direction()
    }.foreach { dir =>
      limit = Some(n)
      topN = Some(dir == SortDirection.DESCENDING)
    }
    false
  }
  override def isPartiallyPushed: Boolean = true

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

  override def build(): Scan =
    new GraftBulkScan(path, required, lo, hi, limit, topN)
}

/**
 * The planned scan. Splits are planned ONCE (lazily) and shared by
 * partition planning, statistics, ordering, and partitioning reports —
 * and re-planned if a RUNTIME filter narrows the token band after
 * compile time (SupportsRuntimeFiltering: Spark's dynamic-pruning rule
 * hands a broadcast join's actual `token` build values to the scan, the
 * per-range section streaming the reference's loader applies at runtime,
 * ExternalSSTableLoaderClient.java:57-137 — a repair join against a few
 * damaged tokens then touches only the runs that can contain them).
 */
final class GraftBulkScan(path: String, required: StructType,
    initLo: Option[Long], initHi: Option[Long],
    limit: Option[Int] = None, topN: Option[Boolean] = None)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsReportOrdering
    with SupportsReportPartitioning with SupportsRuntimeFiltering {

  @volatile private var lo: Option[Long] = initLo
  @volatile private var hi: Option[Long] = initHi
  // a runtime IN set prunes per-run, not just by its global [min, max]:
  // scattered repair tokens hit a few runs each, and a run whose range
  // contains NONE of the values reads nothing
  @volatile private var inSet: Option[Array[Long]] = None
  @volatile private var planned: Seq[GraftBulkRead.PlannedSplit] = _

  // one manifest read serves split planning, statistics, and the
  // ordering/partitioning reports alike
  private lazy val manifests = BulkSink.readManifests(new File(path))

  private def splits: Seq[GraftBulkRead.PlannedSplit] = {
    if (planned == null) {
      val base = GraftBulkRead.planSplits(new File(path), lo, hi, Some(manifests))
      val setPruned = inSet match {
        case Some(vs) => base.filter(s =>
          // random runs pin their Long range full-ring -> always kept
          vs.exists(v => v >= s.minToken && v <= s.maxToken))
        case None => base
      }
      planned = limitPrefix(setPruned)
    }
    planned
  }

  /** LIMIT/ORDER-BY-token-LIMIT planning: take runs (in token order for
    * top-n, directory order for a bare limit) until their EXACT row
    * counts cover the limit. Applied only when no band/set narrowing is
    * active (pro-rated estimates over-count and could under-plan) and
    * every file is manifested (exact counts). A bare LIMIT may take ANY
    * runs; top-n by token additionally needs the directory's ranges to
    * verify DISJOINT (overlapping runs share the extremes) — otherwise
    * nothing is truncated. Spark re-applies the limit/sort either way,
    * so this is purely a plan-size optimization. */
  private def limitPrefix(base: Seq[GraftBulkRead.PlannedSplit])
      : Seq[GraftBulkRead.PlannedSplit] = limit match {
    case Some(n) if lo.isEmpty && hi.isEmpty && inSet.isEmpty &&
        base.forall(_.estRows > 0) && (topN.isEmpty || rangesDisjoint) =>
      val ordered = topN match {
        case None        => base
        case Some(false) => base.sortBy(_.minToken)
        // NOT sortBy(-maxToken): -Long.MinValue overflows back to
        // Long.MinValue, so a run holding only minimum tokens (empty
        // partition keys pin there) would displace the true top runs
        case Some(true)  => base.sortBy(_.maxToken)(Ordering[Long].reverse)
      }
      var covered = 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[GraftBulkRead.PlannedSplit]
      val it = ordered.iterator
      while (covered < n && it.hasNext) {
        val s = it.next()
        out += s
        covered += s.estRows
      }
      out.toSeq
    case _ => base
  }

  /** Disjoint, Murmur3-sorted token ranges across all non-empty runs. */
  private lazy val rangesDisjoint: Boolean = {
    val ms = manifests.filter(_.rows > 0)
    ms.forall(_.minTokenHex.isEmpty) && {
      val sorted = ms.sortBy(_.minToken)
      sorted.sliding(2).forall {
        case Seq(a, b) => a.maxToken < b.minToken
        case _         => true
      }
    }
  }
  private lazy val murmur3Sorted =
    GraftBulkRead.murmur3Sorted(new File(path), Some(manifests))

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column("token"))

  /** Runtime narrowing: fold the join-side token values/bounds into the
    * planned band and re-plan splits. Only [min, max] of an IN set is
    * used — runs are token-RANGE pruned, exactness stays with Spark's
    * post-scan join. Unknown filter shapes are ignored (pruning is
    * best-effort; correctness never depends on it). */
  override def filter(filters: Array[Filter]): Unit = {
    var newLo = lo
    var newHi = hi
    def raise(v: Long): Unit = newLo = Some(newLo.fold(v)(math.max(_, v)))
    def lower(v: Long): Unit = newHi = Some(newHi.fold(v)(math.min(_, v)))
    var newSet = inSet
    filters.foreach {
      case In("token", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Long]) =>
        val longs = vs.map(_.asInstanceOf[Long])
        raise(longs.min); lower(longs.max)
        // intersect with any previous set (both filters must hold)
        newSet = Some(newSet.fold(longs)(prev => prev.intersect(longs)))
      case EqualTo("token", v: Long)            => raise(v); lower(v)
      case GreaterThan("token", v: Long)        => raise(if (v == Long.MaxValue) v else v + 1)
      case GreaterThanOrEqual("token", v: Long) => raise(v)
      case LessThan("token", v: Long)           => lower(if (v == Long.MinValue) v else v - 1)
      case LessThanOrEqual("token", v: Long)    => lower(v)
      case _                                    => ()
    }
    if (newLo != lo || newHi != hi || newSet.map(_.toSet) != inSet.map(_.toSet)) {
      lo = newLo; hi = newHi; inSet = newSet
      planned = null // re-plan with the narrowed band
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    splits.map(s => GraftBulkInputPartition(s.file, s.codec, s.startOffset,
      s.hiBound, s.bucket, s.chunked, s.totalBytes): InputPartition).toArray

  // manifest-derived estimates AFTER token pruning (pro-rated into a run
  // by its sparse index), so Catalyst can broadcast a narrowly-filtered
  // bulk read into a join instead of shuffling both sides (logical bytes:
  // what the scan produces)
  override def estimateStatistics(): Statistics = {
    val known = splits.filter(_.estRows > 0)
    if (known.isEmpty) new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    } else new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.of(known.map(_.estBytes).sum)
      override def numRows() = java.util.OptionalLong.of(known.map(_.estRows).sum)
    }
  }

  // every split is one decorated-key-sorted run: (token ASC, pk ASC) per
  // partition — valid only for Murmur3 runs (the reader reports murmur3
  // tokens, which are unordered inside an md5-sorted random run) and only
  // over columns that survive pruning
  override def outputOrdering(): Array[SortOrder] = {
    val names = required.fieldNames
    if (!murmur3Sorted || !names.contains("token")) Array.empty
    else {
      val tok = Expressions.sort(Expressions.column("token"), SortDirection.ASCENDING)
      if (names.contains("pk"))
        Array(tok, Expressions.sort(Expressions.column("pk"), SortDirection.ASCENDING))
      else Array(tok)
    }
  }

  // every row of a split shares the split's ring slot: key-grouped on the
  // `bucket` column when it survives pruning and every split knows its
  // slot (HasPartitionKey carries the per-split key)
  override def outputPartitioning(): Partitioning = {
    val names = required.fieldNames
    if (names.contains("bucket") && splits.nonEmpty && splits.forall(_.bucket >= 0))
      new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), splits.length)
    else new UnknownPartitioning(splits.length)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBulkReaderFactory(required.fieldNames)
}

final case class GraftBulkInputPartition(file: String, codec: String,
    startOffset: Long = 0L, hiBound: Long = Long.MaxValue, bucket: Int = -1,
    chunked: Boolean = false, totalBytes: Long = -1L)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(Array[Any](bucket))
}

final class GraftBulkReaderFactory(columns: Array[String] = GraftBulkRead.schema.fieldNames)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBulkInputPartition]
    new GraftBulkPartitionReader(p.file, p.codec, p.startOffset, p.hiBound,
      columns, p.bucket, p.chunked, p.totalBytes)
  }
}

final class GraftBulkPartitionReader(file: String, codec: String = "none",
    startOffset: Long = 0L, hiBound: Long = Long.MaxValue,
    columns: Array[String] = GraftBulkRead.schema.fieldNames,
    bucket: Int = -1, chunked: Boolean = false, totalBytes: Long = -1L)
    extends PartitionReader[InternalRow] {
  // uncompressed: seek straight to the logical offset. Compressed with a
  // chunk map: open at the chunk containing the offset (only the physical
  // bytes from there on are read) and skip the in-chunk remainder.
  // Compressed without a chunk map, two distinct cases: the manifest says
  // the run IS chunked (`chunked`) -> the sidecar was LOST (partial copy)
  // and a sequential decompressor would stop at the first chunk boundary,
  // silently returning ~one chunk of rows — fail loudly instead; the
  // manifest predates the chunks field -> a legacy sequential run, which
  // really is one compressed stream — sequential from byte zero
  // (planSplits gives those no startOffset).
  private val in: DataInputStream = {
    val f = new java.io.File(file)
    val chunksFile = graft.sinks.SortedRunWriter.chunksFileFor(f)
    if (codec != "none" && chunked && !chunksFile.exists())
      throw new IllegalStateException(
        s"$file is a chunked $codec run (manifest records a chunk map) but its " +
          s"sidecar ${chunksFile.getName} is missing — refusing to decode " +
          "sequentially, which would silently truncate to the first chunk; " +
          "restore the sidecar or rewrite the run")
    if (codec != "none" && chunksFile.exists()) {
      val chunks = graft.sinks.SortedRunWriter.readChunks(chunksFile)
      // a corrupt sidecar must fail as loudly as a missing one (the
      // StreamLoader wire-framing checks, applied to the disk load)
      graft.sinks.SortedRunWriter.validateChunks(chunksFile, chunks, f.length())
      val (s, logicalStart) =
        graft.sinks.SortedRunWriter.openChunked(f, codec, chunks, startOffset)
      val d = new DataInputStream(s)
      if (startOffset > logicalStart) d.skipNBytes(startOffset - logicalStart)
      d
    } else {
      val d = new DataInputStream(new BufferedInputStream(
        graft.sinks.SortedRunWriter.decompress(codec, new FileInputStream(file)), 1 << 16))
      if (startOffset > 0) d.skipNBytes(startOffset)
      d
    }
  }
  // the value payload is the bulk of a record's bytes; when pruned away it
  // is SKIPPED in the stream, never allocated (the key must always be read
  // to advance the frame, and it feeds the early-stop token anyway)
  private val needValue = columns.contains("value")
  private var current: InternalRow = _
  private var consumed: Long = startOffset

  override def next(): Boolean = {
    try {
      val klen = in.readUnsignedShort()
      val key = new Array[Byte](klen); in.readFully(key)
      val vlen = in.readInt()
      val value = if (needValue) {
        val v = new Array[Byte](vlen); in.readFully(v); v
      } else { in.skipNBytes(vlen.toLong); null }
      consumed += 2L + klen + 4L + vlen
      val token = CassandraTokens.token(key)
      // runs are token-sorted: past the upper bound nothing else matches
      if (token > hiBound) false
      else {
        current = new GenericInternalRow(columns.map[Any] {
          case "token"  => token
          case "pk"     => key
          case "value"  => value
          case "bucket" => bucket
        })
        true
      }
    } catch {
      case _: EOFException =>
        // a natural EOF must land EXACTLY on the manifest's logical byte
        // count — REGARDLESS of any early-stop bound: a bounded split
        // that stops early returns false from the token check and never
        // reaches this handler, so arriving here means the stream itself
        // ended. Short = a truncated Data.db (partial copy) or a
        // compressed stream that ended early (e.g. a legacy-flagged file
        // that was really chunked); long = extra trailing records a
        // stale/foreign manifest never promised. Either way the scan
        // would silently return a different row set than the manifest
        // describes — refuse both.
        if (totalBytes >= 0 && consumed != totalBytes)
          throw new IllegalStateException(
            s"$file ended after $consumed logical bytes, manifest says " +
              s"$totalBytes — truncated or stale-manifest run; refusing the " +
              "inconsistent scan")
        false
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
