package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.core.{CassandraTokens, CqlValueCodec}

/**
 * Bulk-load sink, directory mode: the Spark rebuild of the reference's
 * sorted-SSTable write path (CrunchCqlBulkRecordWriter.java:59-181 /
 * CrunchBulkRecordWriter.java:65-251 — behavior only). Each output
 * partition owns one contiguous token range of the ring; rows arrive
 * pre-sorted in decorated-key order and are appended to a local sorted
 * run ("Data.db" analog) plus a sparse index, exactly the contract a
 * CQLSSTableWriter in .sorted() mode needs. Network streaming to a live
 * cluster (SSTableLoader) is out of scope offline; the manifest records
 * everything a loader needs (token range, file, count, bytes).
 *
 * Scale design: the shuffle is RDD repartitionAndSortWithinPartitions —
 * ONE exchange, sort happens in the shuffle (Tungsten sort-spill), writer
 * is append-only and streams row-at-a-time: no buffering of a partition in
 * memory, so a 100 TB load is bounded by disk, not heap. Speculative
 * execution must stay off (Spark default) so no partition is written twice.
 */
object BulkSink {

  /** Default seed for the bucket->partition permutation (any fixed value
    * works; what matters is that driver and every task agree). */
  val DefaultSlotSeed = 0x5eed5107L

  /**
   * Seeded Fisher-Yates permutation of 0..n-1. The reference shuffles the
   * range->reducer assignment so ADJACENT token ranges (often co-hot: a
   * freshly-written id range, a time-ordered key prefix) do not land on
   * adjacent reducers of the same host (CassandraParams.java:319-328,
   * Collections.shuffle over the reducer list). The reference's shuffle is
   * unseeded-Random-per-job; here it is seeded so any task, retry, or
   * re-run computes the identical bijection with no config channel.
   */
  def slotPermutation(n: Int, seed: Long = DefaultSlotSeed): Array[Int] = {
    val perm = Array.tabulate(n)(identity)
    val rnd = new java.util.Random(seed)
    var i = n - 1
    while (i > 0) {
      val j = rnd.nextInt(i + 1)
      val t = perm(i); perm(i) = perm(j); perm(j) = t
      i -= 1
    }
    perm
  }

  /** Ring-bucket partitioner: bucket b -> partition perm(b) (bijective). */
  final class RingPartitioner(n: Int, seed: Long = DefaultSlotSeed) extends Partitioner {
    require(n > 0)
    private val perm = slotPermutation(n, seed)
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key match {
      case (token: Long, _) => perm(CassandraTokens.bucketOfToken(token, n))
      case token: Long      => perm(CassandraTokens.bucketOfToken(token, n))
      case other            => throw new IllegalArgumentException(s"bad key: $other")
    }
  }

  /** RandomPartitioner ring-bucket partitioner: keys carry canonical
    * 16-byte md5 tokens; buckets are the reference's ceil(2^127/n) ranges
    * (CassandraParams.java:297-316), permuted like the Murmur3 path. */
  final class RandomRingPartitioner(n: Int, seed: Long = DefaultSlotSeed) extends Partitioner {
    require(n > 0)
    private val perm = slotPermutation(n, seed)
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key match {
      case (token: Array[Byte], _) => perm(CassandraTokens.randomBucketOfTokenBytes(token, n))
      case other => throw new IllegalArgumentException(s"bad key: $other")
    }
  }

  /**
   * `distributerandomly` partitioner: spreads rows over partitions with no
   * correlation to ring position, the reference's load-balance escape hatch
   * (CassandraPartitioner.java:58-60 assigns a random reducer). Crucially
   * the reference KEEPS the within-reducer decorated-key sort — the sort
   * comparator applies regardless of routing (CassandraParams.java:291-293)
   * — so the output is still valid sorted runs, just not ring-aligned.
   * The reference draws Random.nextInt per record, safe under MR because
   * map output materializes exactly once; Spark recomputes map tasks on
   * fetch failure, so the assignment must be a pure function of the key:
   * a seeded hash of the partition-key bytes (uncorrelated with the
   * Murmur3 ring token, which keys the sort, not the routing).
   */
  final class RandomSpreadPartitioner(n: Int) extends Partitioner {
    require(n > 0)
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = key match {
      case (_, pk: Array[Byte]) =>
        scala.math.floorMod(scala.util.hashing.MurmurHash3.bytesHash(pk, 0x5eed5107), n)
      case other => throw new IllegalArgumentException(s"bad key: $other")
    }
  }

  /** Decorated-key order: token, then unsigned key bytes (G3 semantics). */
  implicit val decoratedOrdering: Ordering[(Long, Array[Byte])] =
    (a: (Long, Array[Byte]), b: (Long, Array[Byte])) =>
      CassandraTokens.compareDecorated(a._1, a._2, b._1, b._2)

  /** RandomPartitioner decorated-key order: 16-byte md5 token (unsigned
    * lexicographic = numeric), then unsigned key bytes. */
  val randomDecoratedOrdering: Ordering[(Array[Byte], Array[Byte])] =
    (a: (Array[Byte], Array[Byte]), b: (Array[Byte], Array[Byte])) => {
      val c = CassandraTokens.compareUnsigned(a._1, b._1)
      if (c != 0) c else CassandraTokens.compareUnsigned(a._2, b._2)
    }

  /** `bytes` is the LOGICAL record-stream size (what a re-parse yields);
    * `physicalBytes` is the on-disk size (what a transfer costs) — they
    * differ only for compressed runs, whose `indexFile` is empty
    * (sequential-only format, ADR 0001). -1 = written by a pre-r8 job.
    * RandomPartitioner runs carry their md5 token range as 32-char hex in
    * `minTokenHex`/`maxTokenHex` (md5 tokens reach 2^127 and overflow the
    * Long fields, which such runs pin to the full range so Long-token
    * pruning keeps them); empty hex = a Murmur3 run.
    * `chunks` is the compressed run's chunk-map entry count: readers use
    * it to tell "this run NEEDS its Chunks.db sidecar" (a missing sidecar
    * then fails loudly instead of silently decoding only the first chunk)
    * from a legacy pre-chunking sequential run (-1 = written before the
    * field existed, chunked-ness unknown; 0 = uncompressed). */
  final case class PartitionManifest(
      partition: Int, rows: Long, bytes: Long, minToken: Long, maxToken: Long,
      sorted: Boolean, dataFile: String, indexFile: String, codec: String = "none",
      physicalBytes: Long = -1L, minTokenHex: String = "", maxTokenHex: String = "",
      chunks: Int = -1)

  /**
   * Write `df` as sorted per-token-range runs under `outDir`.
   * `keyCols` form the partition key (composite if 2+). Every column is
   * serialized with the CQL wire codec. Returns per-partition manifests
   * (also persisted as _MANIFEST.json).
   */
  def writeSorted(df: DataFrame, keyCols: Seq[String], numBuckets: Int,
      outDir: String, indexInterval: Int = 128,
      partitionerClass: String = graft.core.CassandraParams.Murmur3Partitioner,
      compression: Option[String] = None,
      distributeRandomly: Boolean = false,
      chunkSize: Int = SortedRunWriter.DefaultChunkSize)
      : Seq[PartitionManifest] = {
    require(keyCols.nonEmpty)
    // resolve the codec and validate the chunk size DRIVER-side so a bad
    // option fails before the shuffle runs, not in task 0 of the write stage
    val codec = compression.map(SortedRunWriter.normalizeCodec)
    require(chunkSize >= 1024, s"chunkSize must be >= 1 KiB, got $chunkSize")
    val isRandom = partitionerClass match {
      case graft.core.CassandraParams.Murmur3Partitioner => false
      case graft.core.CassandraParams.RandomPartitioner  => true
      case other => throw new IllegalArgumentException(
        s"unknown partitioner class: $other")
    }
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val serializers: Array[Row => Array[Byte]] =
      schema.fields.map(f => rowSerializer(f, schema.fieldIndex(f.name)))

    Files.createDirectories(Paths.get(outDir))

    // distributerandomly changes ONLY the routing; the shuffle still sorts
    // every partition in decorated-key order, so both paths emit valid
    // sorted runs — random ones just span the full token range (their
    // manifests say so, and the stream plan fans them to all replicas)
    val manifests: Seq[PartitionManifest] = if (isRandom) {
      // RandomPartitioner (CassandraPartitioner.java:46-47,63-72): tokens
      // are abs(md5(key)) carried as canonical 16-byte big-endian values,
      // bucketed by ceil(2^127/n) ranges, sorted unsigned-lexicographic
      // (= numeric md5 token order)
      val keyed = df.rdd.map { row =>
        val comps = keyIdx.map(i => serializers(i)(row))
        val pk = if (comps.length == 1) comps(0) else CqlValueCodec.composite(comps)
        ((CassandraTokens.md5TokenBytes(pk), pk), encodeRow(row, serializers))
      }
      val partitioner: Partitioner =
        if (distributeRandomly) new RandomSpreadPartitioner(numBuckets)
        else new RandomRingPartitioner(numBuckets)
      // the ordered-RDD conversion needs the key Ordering implicitly
      implicit val ord: Ordering[(Array[Byte], Array[Byte])] = randomDecoratedOrdering
      val aligned = keyed.repartitionAndSortWithinPartitions(partitioner)
      aligned.mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(writeRandomPartition(outDir, pid, it, codec, chunkSize))
      }.collect().toSeq
    } else {
      val keyed = df.rdd.map { row =>
        val comps = keyIdx.map(i => serializers(i)(row))
        val pk = if (comps.length == 1) comps(0) else CqlValueCodec.composite(comps)
        val token = CassandraTokens.token(pk)
        val value = encodeRow(row, serializers)
        ((token, pk), value)
      }
      val partitioner: Partitioner =
        if (distributeRandomly) new RandomSpreadPartitioner(numBuckets)
        else new RingPartitioner(numBuckets)
      val aligned = keyed.repartitionAndSortWithinPartitions(partitioner)
      aligned.mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(writePartition(outDir, pid, it, indexInterval, codec, chunkSize))
      }.collect().toSeq
    }

    val json = manifests.map(manifestJson).mkString("[", ",", "]")
    Files.write(Paths.get(outDir, "_MANIFEST.json"), json.getBytes(StandardCharsets.UTF_8))
    manifests
  }

  /**
   * Ring-bucket partitioner with per-bucket SALTING for hot token
   * ranges: bucket `b` expands to `salts(b)` sub-buckets, rows route to
   * a sub-bucket by a seeded hash of the PARTITION-KEY bytes (a pure
   * function of the key — Spark may recompute map tasks on fetch
   * failure, so per-record randomness would corrupt the shuffle; and
   * same-pk rows stay in ONE sub-bucket, so the k-way merge never has
   * to interleave equal keys from two runs and same-key rows remain
   * contiguous, the newRow-on-key-change contract). The sub-bucket hash
   * is Scala's Murmur3 x86 under its own seed — uncorrelated with the
   * Cassandra x64_128 ring token that keys the SORT. The slot
   * permutation applies over the TOTAL sub-bucket count, so a hot
   * range's sub-buckets spread across reducers like adjacent ranges do.
   *
   * This is the answer SURVEY §7.4 risk 5 asks for: the reference's
   * only hot-range escape (`distributerandomly`,
   * CassandraPartitioner.java:58-60) forfeits ring alignment for EVERY
   * range; salting splits only the hot ones and [[writeSortedSalted]]'s
   * sink-side merge restores the one-sorted-run-per-range contract.
   */
  final class SaltedRingPartitioner(n: Int, salts: Map[Int, Int],
      seed: Long = DefaultSlotSeed) extends Partitioner {
    require(n > 0)
    require(salts.forall { case (b, k) => b >= 0 && b < n && k >= 1 },
      s"saltBuckets must map bucket in [0, $n) -> subBuckets >= 1: $salts")
    private[sinks] val kOf = Array.tabulate(n)(b => salts.getOrElse(b, 1))
    private[sinks] val offsets = kOf.scanLeft(0)(_ + _) // length n+1
    /** Total shuffle partitions: n plus the extra sub-buckets. */
    val total: Int = offsets(n)
    private val perm = slotPermutation(total, seed)
    override def numPartitions: Int = total
    override def getPartition(key: Any): Int = key match {
      case (token: Long, pk: Array[Byte]) =>
        val b = CassandraTokens.bucketOfToken(token, n)
        val k = kOf(b)
        val sub =
          if (k == 1) 0
          else scala.math.floorMod(
            scala.util.hashing.MurmurHash3.bytesHash(pk, 0x5a17ed), k)
        perm(offsets(b) + sub)
      case other => throw new IllegalArgumentException(s"bad key: $other")
    }
  }

  /** Test observability: per SALTED bucket, the phase-1 sub-run row
    * counts of the last [[writeSortedSalted]] call — lets a spec pin
    * that a planted hot range actually spread across its sub-buckets. */
  @volatile private[graft] var lastSaltSubRows: Map[Int, Seq[Long]] = Map.empty

  /**
   * [[writeSorted]] with hot-range salting (Murmur3 partitioner only):
   * each bucket in `saltBuckets` shuffles as `k` salted sub-buckets —
   * `k` reducers share the hot range's rows and sort-spill in parallel,
   * instead of one reducer owning the whole range
   * (CassandraPartitioner.java:57-72's one-range-one-reducer shape) —
   * and the sink then K-WAY MERGES each hot range's `k` sorted sub-runs
   * back into ONE globally decorated-key-sorted run, so the output
   * layout is indistinguishable from an unsalted write: one sorted run
   * per ring bucket, manifest `partition` = bucket id. Unsalted buckets
   * write final-form runs in one pass (their files just move into
   * place).
   *
   * Scale shape: the merge is one task per HOT range (a handful), each
   * streaming `k` sorted runs through a k-element heap — sequential
   * I/O, constant memory, no re-sort; the hot range's bytes are read
   * once more than the unsalted path would, the price of removing the
   * straggler reducer. Like the rest of this sink, `outDir` must be a
   * filesystem every executor and the driver can reach.
   */
  def writeSortedSalted(df: DataFrame, keyCols: Seq[String],
      numBuckets: Int, outDir: String, saltBuckets: Map[Int, Int],
      indexInterval: Int = 128, compression: Option[String] = None,
      chunkSize: Int = SortedRunWriter.DefaultChunkSize)
      : Seq[PartitionManifest] = {
    require(keyCols.nonEmpty)
    val codec = compression.map(SortedRunWriter.normalizeCodec)
    require(chunkSize >= 1024, s"chunkSize must be >= 1 KiB, got $chunkSize")
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val serializers: Array[Row => Array[Byte]] =
      schema.fields.map(f => rowSerializer(f, schema.fieldIndex(f.name)))
    Files.createDirectories(Paths.get(outDir))
    val tmpPath = new java.io.File(outDir, "_salt-tmp").getAbsolutePath
    Files.createDirectories(Paths.get(tmpPath))

    val partitioner = new SaltedRingPartitioner(numBuckets, saltBuckets)
    val kOf = partitioner.kOf
    val offsets = partitioner.offsets
    // a task derives which (bucket, sub) it owns by inverting the slot
    // permutation (same seed -> same bijection, no config channel)
    val perm = slotPermutation(partitioner.total)
    val inv = new Array[Int](perm.length)
    perm.zipWithIndex.foreach { case (p, s) => inv(p) = s }

    val keyed = df.rdd.map { row =>
      val comps = keyIdx.map(i => serializers(i)(row))
      val pk = if (comps.length == 1) comps(0) else CqlValueCodec.composite(comps)
      ((CassandraTokens.token(pk), pk), encodeRow(row, serializers))
    }
    val aligned = keyed.repartitionAndSortWithinPartitions(partitioner)
    // staging is reclaimed on EVERY exit: a failed phase-1 task or merge
    // must not strand a hot range's worth of sub-run bytes under the
    // output dir across retries
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }
    try {
      // phase 1: every shuffle partition writes a sorted run into the
      // staging dir — unsalted buckets final-form (index + codec, they
      // only need a rename), salted sub-runs plain (the merge re-reads
      // them anyway and re-encodes once, in the final writer)
      val phase1: Seq[(Int, Int, PartitionManifest)] =
        aligned.mapPartitionsWithIndex { (pid, it) =>
          val sub = inv(pid)
          var b = java.util.Arrays.binarySearch(offsets, sub)
          if (b < 0) b = -b - 2
          val m =
            if (kOf(b) == 1)
              writePartition(tmpPath, pid, it, indexInterval, codec, chunkSize)
            else
              writePartition(tmpPath, pid, it, indexInterval, None, chunkSize)
          Iterator.single((b, sub - offsets(b), m))
        }.collect().toSeq

      val byBucket = phase1.groupBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[PartitionManifest]
      // unsalted buckets: rename the final-form files into place under the
      // bucket's pid (driver-side, #buckets renames, no data read)
      byBucket.toSeq.filter { case (b, _) => kOf(b) == 1 }.foreach {
        case (b, group) =>
          val m = group.head._3
          def mv(name: String, newName: String): String = {
            Files.move(Paths.get(tmpPath, name), Paths.get(outDir, newName))
            newName
          }
          val data = mv(m.dataFile, f"graft-$b%05d-Data.db")
          val idx =
            if (m.indexFile.isEmpty) ""
            else mv(m.indexFile, f"graft-$b%05d-Index.db")
          if (m.chunks > 0)
            mv(m.dataFile.replace("-Data.db", "-Chunks.db"),
              f"graft-$b%05d-Chunks.db")
          out += m.copy(partition = b, dataFile = data, indexFile = idx)
      }
      // salted buckets: one merge task per hot range, distributed; each
      // merge must reproduce its phase-1 row total exactly
      val saltedGroups = byBucket.toSeq.collect {
        case (b, group) if kOf(b) > 1 =>
          (b, group.sortBy(_._2).map(_._3.dataFile),
            group.map(_._3.rows).sum)
      }
      lastSaltSubRows = byBucket.collect {
        case (b, group) if kOf(b) > 1 =>
          b -> group.sortBy(_._2).map(_._3.rows)
      }.toMap
      if (saltedGroups.nonEmpty) {
        val sc = df.sparkSession.sparkContext
        out ++= sc.parallelize(saltedGroups, saltedGroups.size).map {
          case (b, dataFiles, expRows) =>
            mergeSubRuns(tmpPath, outDir, b, dataFiles, expRows,
              indexInterval, codec, chunkSize)
        }.collect()
      }
      val manifests = out.sortBy(_.partition).toSeq
      val json = manifests.map(manifestJson).mkString("[", ",", "]")
      Files.write(Paths.get(outDir, "_MANIFEST.json"),
        json.getBytes(StandardCharsets.UTF_8))
      manifests
    } finally rmTree(new java.io.File(tmpPath))
  }

  /** Streaming cursor over one sub-run's record frames (2-byte key len +
    * key + 4-byte value len + value); tokens recompute from the key —
    * the run format stores none. EOF is clean ONLY at a record boundary:
    * an EOF inside a record means a truncated sub-run (partial flush,
    * partial visibility on a shared filesystem) and fails LOUDLY — a
    * silent early stop would undercount the merged output. */
  private final class RunCursor(file: java.io.File) {
    private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file), 1 << 16))
    var token: Long = 0L
    var key: Array[Byte] = _
    var value: Array[Byte] = _
    def advance(): Boolean = {
      // the 2-byte key-length prefix is read byte-wise: readUnsignedShort
      // throws the SAME EOFException whether 0 or 1 of its bytes remain,
      // which would silently drop a record torn mid-prefix — only a clean
      // EOF BEFORE the first byte is end-of-run
      val b0 = in.read()
      if (b0 < 0) { close(); return false }
      val b1 = in.read()
      if (b1 < 0) {
        close()
        throw new IllegalStateException(
          s"sub-run $file is truncated mid-record (EOF inside the key-" +
            "length prefix) — refusing to merge a partial run (the " +
            "merged output would silently undercount)")
      }
      val klen = (b0 << 8) | b1
      try {
        key = new Array[Byte](klen); in.readFully(key)
        val vlen = in.readInt()
        value = new Array[Byte](vlen); in.readFully(value)
      } catch {
        case e: java.io.EOFException =>
          close()
          throw new IllegalStateException(
            s"sub-run $file is truncated mid-record — refusing to merge " +
              "a partial run (the merged output would silently " +
              "undercount)", e)
      }
      token = CassandraTokens.token(key)
      true
    }
    def close(): Unit = try in.close() catch { case _: Exception => () }
  }

  /** K-way merge of one hot range's sorted sub-runs into its final
    * decorated-key-sorted run: a k-element min-heap streams the runs —
    * sequential reads, O(k) memory — and the writer's own sorted-input
    * check re-verifies global order at write time (any heap or routing
    * bug fails loudly, never ships an unsorted run). `expectedRows`
    * (the phase-1 manifests' sum) is REQUIRED to match the merged
    * count — belt over the cursor's truncation check. */
  private[graft] def mergeSubRuns(tmpDir: String, outDir: String,
      bucket: Int, dataFiles: Seq[String], expectedRows: Long,
      indexInterval: Int, codec: Option[String],
      chunkSize: Int): PartitionManifest = {
    val writer = new SortedRunWriter(outDir, bucket, indexInterval, codec,
      chunkSize = chunkSize)
    val cursors = dataFiles.map(f => new RunCursor(new java.io.File(tmpDir, f)))
    try {
      val heap = new java.util.PriorityQueue[RunCursor](
        math.max(1, cursors.size),
        (a: RunCursor, b: RunCursor) =>
          CassandraTokens.compareDecorated(a.token, a.key, b.token, b.key))
      cursors.foreach(c => if (c.advance()) { heap.add(c); () })
      while (!heap.isEmpty) {
        val c = heap.poll()
        writer.add(c.token, c.key, c.value)
        if (c.advance()) { heap.add(c); () }
      }
      val m = writer.close()
      require(m.rows == expectedRows,
        s"merged run for bucket $bucket carries ${m.rows} rows, " +
          s"phase-1 sub-runs declared $expectedRows — a sub-run was " +
          "truncated or foreign; refusing the undercounted merge")
      m
    } catch { case e: Throwable => writer.abort(); throw e }
    finally cursors.foreach(_.close())
  }

  /**
   * Hot-range detection for [[writeSortedSalted]]: estimates each ring
   * bucket's row share from one seeded sample pass and proposes
   * `ceil(share / mean)` sub-buckets (capped at `maxSalt`) for every
   * bucket whose share exceeds `hotFactor`× the mean. Driver state is
   * #buckets counters; empty result means the ring is balanced and the
   * plain [[writeSorted]] is the right call.
   */
  def planSalts(df: DataFrame, keyCols: Seq[String], numBuckets: Int,
      sampleFraction: Double = 0.01, hotFactor: Double = 2.0,
      maxSalt: Int = 16): Map[Int, Int] = {
    require(keyCols.nonEmpty)
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex).toArray
    val serializers: Array[Row => Array[Byte]] =
      schema.fields.map(f => rowSerializer(f, schema.fieldIndex(f.name)))
    val counts = df.sample(withReplacement = false, sampleFraction,
        seed = DefaultSlotSeed)
      .rdd.map { row =>
        val comps = keyIdx.map(i => serializers(i)(row))
        val pk = if (comps.length == 1) comps(0)
          else CqlValueCodec.composite(comps)
        CassandraTokens.bucketOfToken(CassandraTokens.token(pk), numBuckets)
      }.countByValue()
    val totalN = counts.values.sum.toDouble
    if (totalN == 0) return Map.empty
    val mean = totalN / numBuckets
    counts.collect {
      case (b, c) if c > hotFactor * mean =>
        b -> math.min(maxSalt, math.ceil(c / mean).toInt)
    }.toMap
  }

  /** One manifest entry as JSON (shared by the RDD and DSv2 sinks). The
    * hex token-range fields appear only for RandomPartitioner runs. */
  def manifestJson(m: PartitionManifest): String = {
    val hexFields =
      if (m.minTokenHex.isEmpty) ""
      else s""""minTokenHex":"${m.minTokenHex}","maxTokenHex":"${m.maxTokenHex}","""
    s"""{"partition":${m.partition},"rows":${m.rows},"bytes":${m.bytes},""" +
      s""""physicalBytes":${m.physicalBytes},"chunks":${m.chunks},""" +
      hexFields +
      s""""minToken":${m.minToken},"maxToken":${m.maxToken},"sorted":${m.sorted},""" +
      s""""dataFile":"${m.dataFile}","indexFile":"${m.indexFile}","codec":"${m.codec}"}"""
  }

  private val ManifestEntryRe =
    ("""\{"partition":(-?\d+),"rows":(\d+),"bytes":(\d+),(?:"physicalBytes":(-?\d+),)?""" +
      """(?:"chunks":(-?\d+),)?""" +
      """(?:"minTokenHex":"([0-9a-f]*)","maxTokenHex":"([0-9a-f]*)",)?""" +
      """"minToken":(-?\d+),"maxToken":(-?\d+),"sorted":(true|false),""" +
      """"dataFile":"([^"]+)","indexFile":"([^"]*)","codec":"([^"]+)"\}""").r

  /** Parse a _MANIFEST.json written by either sink (the physicalBytes and
    * hex token-range fields are absent in older manifests). Empty if the
    * file is missing. */
  def readManifests(dir: java.io.File): Seq[PartitionManifest] = {
    val mf = new java.io.File(dir, "_MANIFEST.json")
    if (!mf.exists()) Nil
    else {
      val json = new String(Files.readAllBytes(mf.toPath), StandardCharsets.UTF_8)
      ManifestEntryRe.findAllMatchIn(json).map { g =>
        PartitionManifest(g.group(1).toInt, g.group(2).toLong, g.group(3).toLong,
          g.group(8).toLong, g.group(9).toLong, g.group(10).toBoolean,
          g.group(11), g.group(12), g.group(13),
          physicalBytes = Option(g.group(4)).map(_.toLong).getOrElse(-1L),
          minTokenHex = Option(g.group(6)).getOrElse(""),
          maxTokenHex = Option(g.group(7)).getOrElse(""),
          chunks = Option(g.group(5)).map(_.toInt).getOrElse(-1))
      }.toSeq
    }
  }

  /** Append-only sorted-run writer; enforces the sorted-input contract
    * (the .sorted() writer requirement — the reference's newRow-on-key-
    * change would corrupt on unsorted input). */
  private def writePartition(outDir: String, pid: Int,
      it: Iterator[((Long, Array[Byte]), Array[Byte])],
      indexInterval: Int, codec: Option[String],
      chunkSize: Int = SortedRunWriter.DefaultChunkSize): PartitionManifest = {
    val writer = new SortedRunWriter(outDir, pid, indexInterval, codec,
      chunkSize = chunkSize)
    try {
      while (it.hasNext) {
        val ((token, key), value) = it.next()
        writer.add(token, key, value)
      }
      writer.close()
    } catch { case e: Throwable => writer.abort(); throw e }
  }

  /** RandomPartitioner variant: keys arrive as canonical md5 token bytes. */
  private def writeRandomPartition(outDir: String, pid: Int,
      it: Iterator[((Array[Byte], Array[Byte]), Array[Byte])],
      codec: Option[String],
      chunkSize: Int = SortedRunWriter.DefaultChunkSize): PartitionManifest = {
    val writer = new SortedRunWriter(outDir, pid, compression = codec,
      randomTokens = true, chunkSize = chunkSize)
    try {
      while (it.hasNext) {
        val ((token, key), value) = it.next()
        writer.addRandom(token, key, value)
      }
      writer.close()
    } catch { case e: Throwable => writer.abort(); throw e }
  }

  /** Length-prefixed concatenation of all serialized column values. */
  private def encodeRow(row: Row, serializers: Array[Row => Array[Byte]]): Array[Byte] = {
    var total = 0
    val parts = new Array[Array[Byte]](serializers.length)
    var i = 0
    while (i < serializers.length) {
      parts(i) = serializers(i)(row)
      total += 4 + parts(i).length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    i = 0
    while (i < serializers.length) {
      bb.putInt(parts(i).length); bb.put(parts(i)); i += 1
    }
    bb.array()
  }

  /** Per-field wire serializer (F1/F2 semantics, null -> empty buffer). */
  private def rowSerializer(f: StructField, i: Int): Row => Array[Byte] = f.dataType match {
    case StringType  => r => if (r.isNullAt(i)) CqlValueCodec.Empty else CqlValueCodec.serializeString(r.getString(i))
    case LongType    => r => if (r.isNullAt(i)) CqlValueCodec.Empty else CqlValueCodec.serializeLong(r.getLong(i))
    case IntegerType => r => if (r.isNullAt(i)) CqlValueCodec.Empty else CqlValueCodec.serializeInt(r.getInt(i))
    case ShortType   => r => if (r.isNullAt(i)) CqlValueCodec.Empty else CqlValueCodec.serializeShort(r.getShort(i))
    case DoubleType  => r => if (r.isNullAt(i)) CqlValueCodec.Empty else CqlValueCodec.serializeDouble(r.getDouble(i))
    case FloatType   => r => if (r.isNullAt(i)) CqlValueCodec.Empty else CqlValueCodec.serializeFloat(r.getFloat(i))
    case BooleanType => r => if (r.isNullAt(i)) CqlValueCodec.Empty else CqlValueCodec.serializeBoolean(r.getBoolean(i))
    case BinaryType  => r => if (r.isNullAt(i)) CqlValueCodec.Empty else r.getAs[Array[Byte]](i)
    case TimestampType => r => if (r.isNullAt(i)) CqlValueCodec.Empty
      else CqlValueCodec.serializeLong(r.getAs[java.sql.Timestamp](i).getTime)
    case TimestampNTZType => r => if (r.isNullAt(i)) CqlValueCodec.Empty
      else CqlValueCodec.serializeLong(
        r.getAs[java.time.LocalDateTime](i).toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    case DateType => r => if (r.isNullAt(i)) CqlValueCodec.Empty
      else CqlValueCodec.serializeInt(r.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
    case _: DecimalType => r => if (r.isNullAt(i)) CqlValueCodec.Empty
      else CqlValueCodec.serializeDecimal(r.getAs[java.math.BigDecimal](i))
    case ArrayType(el, _) => r => if (r.isNullAt(i)) CqlValueCodec.Empty else {
      val seq = r.getSeq[Any](i)
      CqlValueCodec.serializeCollection(seq.map(serializeAny(el, _)))
    }
    case MapType(kt, vt, _) => r => if (r.isNullAt(i)) CqlValueCodec.Empty else {
      val m = r.getMap[Any, Any](i)
      CqlValueCodec.serializeMap(m.toSeq.map { case (k, v) =>
        (serializeAny(kt, k), serializeAny(vt, v)) })
    }
    case st: StructType => r => if (r.isNullAt(i)) CqlValueCodec.Empty else {
      val nested = r.getStruct(i)
      CqlValueCodec.composite(st.fields.zipWithIndex.map { case (nf, ni) =>
        if (nested.isNullAt(ni)) CqlValueCodec.Empty else serializeAny(nf.dataType, nested.get(ni))
      })
    }
    case other => throw new IllegalArgumentException(
      s"cannot serialize column ${f.name} of type $other to Cassandra wire bytes")
  }

  private def serializeAny(dt: DataType, v: Any): Array[Byte] =
    if (v == null) CqlValueCodec.Empty
    else dt match {
      case StringType  => CqlValueCodec.serializeString(v.toString)
      case LongType    => CqlValueCodec.serializeLong(v.asInstanceOf[Long])
      case IntegerType => CqlValueCodec.serializeInt(v.asInstanceOf[Int])
      case DoubleType  => CqlValueCodec.serializeDouble(v.asInstanceOf[Double])
      case FloatType   => CqlValueCodec.serializeFloat(v.asInstanceOf[Float])
      case BooleanType => CqlValueCodec.serializeBoolean(v.asInstanceOf[Boolean])
      case BinaryType  => v.asInstanceOf[Array[Byte]]
      case other => throw new IllegalArgumentException(s"collection element type $other unsupported")
    }
}
