package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The lakehouse layout pair composed end-to-end: a z-clustered multi-file
 * write ([[Zorder]]) plus a Delta-style per-file min/max stats manifest,
 * and a manifest-pruned read that opens ONLY the files whose stats
 * overlap the predicate — the file-skipping mechanic Delta's transaction
 * log and Iceberg's manifests provide, built from plain parquet +
 * DataFrame ops.
 *
 * == The commit log ==
 *
 * Every mutation commits a NEW manifest snapshot under a versioned log:
 *
 * {{{
 *   path/data/part-*.parquet          the immutable data files
 *   path/_log/v0000000042/manifest/   full stats snapshot (1 row/file)
 *   path/_log/v0000000042/_commit     marker: op + streamId + batchId
 * }}}
 *
 * A version becomes visible atomically when its `_commit` marker lands
 * (written to `_commit.tmp`, then renamed — rename-to-a-new-name is
 * atomic on HDFS, object-store committers, and local FS alike). Readers
 * resolve "latest committed version" once per read and replay exactly
 * that snapshot, which gives SNAPSHOT ISOLATION through concurrent
 * [[compact]]/[[appendClustered]] calls: no mutation ever rewrites or
 * deletes a file an existing snapshot references — superseded files are
 * reclaimed only by an explicit [[vacuum]]. A version directory without
 * a marker is an invisible crashed attempt; the next writer (or
 * [[vacuum]]) reclaims it. Writers are SINGLE-WRITER by contract (same
 * as a Delta table without a coordination service); a lost race still
 * fails loudly — the second writer's manifest write or marker rename
 * throws rather than corrupting the log.
 *
 * Each `_commit` records a `(streamId, batchId)` pair, the Delta `txn`
 * action analog: [[graft.streaming.LakehouseIngest]] fences re-delivered
 * `foreachBatch` batches on it, upgrading streaming ingest from
 * at-least-once to EXACTLY-ONCE (spec-pinned by replaying a batch and
 * observing unchanged row counts).
 *
 * Scale shape: the manifest holds one row per DATA FILE (not per row), so
 * planning a pruned read is a driver-side replay of a #files-row table —
 * exactly Delta-log/Iceberg-manifest sized, the one collect in this
 * module and legitimate for the same reason theirs is. Commit markers are
 * ~100-byte files read driver-side (#versions of them — the Delta log
 * listing); [[vacuum]] drops superseded manifests but keeps every marker,
 * so txn fencing survives maintenance. Because the data is z-ordered on
 * the stats columns, every file covers a tight hyper-rectangle in ALL of
 * them at once, so a range predicate on ANY clustered column eliminates
 * most files before a byte of data is read.
 */
object Lakehouse {

  // ------------------------------------------------------------------
  // log protocol
  // ------------------------------------------------------------------

  private val VersionDirRe = "^v(\\d{10})$".r

  private def logDir(path: String) = s"$path/_log"
  private def versionDir(path: String, v: Long) = f"${logDir(path)}/v$v%010d"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending — a directory listing of `_log`
    * filtered to dirs whose `_commit` marker exists (a marker-less dir is
    * an invisible crashed attempt). Driver-sized: #versions entries. */
  private def committedVersions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = fsOf(spark, path)
    val ld = new Path(logDir(path))
    if (!fs.exists(ld)) Seq.empty
    else fs.listStatus(ld).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionDirRe(n) if fs.exists(new Path(st.getPath, "_commit")) =>
          Some(n.toLong)
        case _ => None
      }
    }.sorted
  }

  /** Latest committed version, or -1 if `path` holds no log. */
  def latestVersion(spark: SparkSession, path: String): Long =
    committedVersions(spark, path).lastOption.getOrElse(-1L)

  /** The live stats manifest (one row per data file of the latest
    * committed snapshot). */
  def readManifest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path)
    require(v >= 0, s"no committed lakehouse log at $path — writeClustered first")
    manifestAt(spark, path, v)
  }

  /** The stats manifest of a PINNED version — the snapshot-isolation
    * read path: a reader that resolved version `v` keeps replaying `v`'s
    * manifest (and its data files, which no mutation deletes) however
    * many commits land meanwhile. Valid until a [[vacuum]] whose
    * `retainVersions` window has moved past `v`. */
  def manifestAt(spark: SparkSession, path: String, version: Long): DataFrame =
    spark.read.parquet(s"${versionDir(path, version)}/manifest")

  /** Highest `batchId` ever committed for `streamId`, or -1 — the Delta
    * `txn` lookup [[graft.streaming.LakehouseIngest]] fences on.
    * [[vacuum]] preserves commit markers precisely so this survives
    * manifest pruning. A stream's batchIds are committed in increasing
    * version order ([[appendClustered]]'s fence enforces it), so the
    * NEWEST version carrying `streamId` holds its max batchId — the
    * scan walks versions descending and stops at the first hit: O(1)
    * marker reads per micro-batch in steady state (the stream itself
    * wrote the latest commit), not O(#versions), which on an object
    * store would turn every commit into thousands of round trips. */
  def lastCommittedBatch(spark: SparkSession, path: String,
      streamId: String): Long = {
    require(streamId.nonEmpty, "lastCommittedBatch: empty streamId")
    val fs = fsOf(spark, path)
    committedVersions(spark, path).reverseIterator
      .map(v => readCommit(fs, path, v))
      .collectFirst { case c if c.streamId == streamId => c.batchId }
      .getOrElse(-1L)
  }

  /** DESCRIBE-HISTORY analog: one row per committed version —
    * `(version, op, stream_id, batch_id, n_files, n_rows)` — assembled
    * driver-side from the commit markers plus each retained manifest
    * (#versions tiny reads; a vacuumed version's file/row counts are
    * null, its identity row survives). The observability surface a
    * table owner audits ingest and maintenance with. */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    committedVersions(spark, path).map { v =>
      val c = readCommit(fs, path, v)
      val counts =
        if (fs.exists(new Path(versionDir(path, v), "manifest"))) {
          val m = manifestAt(spark, path, v)
            .agg(count(lit(1)), sum(col("n_rows"))).head()
          (Some(m.getLong(0)), Some(m.getLong(1)))
        } else (None, None)
      (v, c.op, c.streamId, c.batchId, counts._1, counts._2)
    }.toDF("version", "op", "stream_id", "batch_id", "n_files", "n_rows")
  }

  private case class CommitInfo(op: String, streamId: String, batchId: Long)

  private def readCommit(fs: FileSystem, path: String, v: Long): CommitInfo = {
    val in = fs.open(new Path(versionDir(path, v), "_commit"))
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    CommitInfo(props.getProperty("op", ""), props.getProperty("streamId", ""),
      props.getProperty("batchId", "-1").toLong)
  }

  /** Writes `manifest` as the next snapshot and makes it visible with an
    * atomic marker rename. Fail-loud on a lost writer race: the manifest
    * write (`mode=error`) or the rename throws before anything becomes
    * visible. Crashed-attempt debris at this version (dir, no marker) is
    * reclaimed first — safe under the single-writer contract. */
  private def commitVersion(spark: SparkSession, path: String,
      manifest: DataFrame, op: String, streamId: String,
      batchId: Long): Long = {
    val fs = fsOf(spark, path)
    val v = latestVersion(spark, path) + 1
    val vd = new Path(versionDir(path, v))
    if (fs.exists(vd)) {
      if (fs.exists(new Path(vd, "_commit")))
        throw new IllegalStateException(
          s"lakehouse log at $path: version $v committed concurrently — " +
            "this layout is single-writer")
      fs.delete(vd, true)
    }
    manifest.coalesce(1).write.mode("error")
      .parquet(new Path(vd, "manifest").toString)
    val props = new java.util.Properties()
    props.setProperty("op", op)
    props.setProperty("streamId", streamId)
    props.setProperty("batchId", batchId.toString)
    val tmp = new Path(vd, "_commit.tmp")
    val out = fs.create(tmp, false)
    try props.store(out, null) finally out.close()
    if (!fs.rename(tmp, new Path(vd, "_commit")))
      throw new IllegalStateException(
        s"lakehouse log at $path: commit marker rename for version $v " +
          "failed — concurrent writer?")
    v
  }

  // ------------------------------------------------------------------
  // writes
  // ------------------------------------------------------------------

  /**
   * Creates a FRESH layout: writes `df` z-clustered on `zCols` into
   * `files` parquet files under `path/data`, then commits version 0 of
   * the one-row-per-file stats manifest (min/max of every `zCols` member
   * + row count). Any prior log at `path` is dropped (create-table
   * semantics). The stats pass is a column-pruned scan of just the
   * clustered columns grouped by `input_file_name()` — on columnar
   * storage it reads only those columns, the analog of collecting
   * footer stats at write time.
   *
   * `streamId`/`batchId` stamp the commit for txn fencing when the
   * creating write IS a stream's first batch (see
   * [[graft.streaming.LakehouseIngest]]); leave defaulted otherwise.
   *
   * This is DESTRUCTIVE create-table, not an atomic REPLACE: the old
   * log is dropped and the data dir overwritten before version 0
   * commits, so a concurrent reader of the OLD table loses its files
   * (an atomic replace would need versioned data subdirs — out of
   * scope; [[appendClustered]]/[[compact]] are the snapshot-safe
   * mutations).
   */
  def writeClustered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16, streamId: String = "",
      batchId: Long = -1L): Unit = {
    val spark = df.sparkSession
    fsOf(spark, path).delete(new Path(logDir(path)), true)
    Zorder.writeZOrdered(df, zCols, s"$path/data", files, bits)
    commitVersion(spark, path,
      statsOf(spark.read.parquet(s"$path/data"), zCols),
      "create", streamId, batchId)
  }

  /** One manifest row per file of `data`: min/max of every clustered
    * column + row count, grouped by `input_file_name()` — a column-pruned
    * scan of just the stats columns, the analog of collecting footer
    * stats at write time. */
  private def statsOf(data: DataFrame, zCols: Seq[String]): DataFrame = {
    val aggs = zCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    data.select(input_file_name().as("file") +: zCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Data-file listing (driver-side, manifest-replay sized). */
  private def listData(spark: SparkSession, path: String): Set[String] = {
    val p = new Path(s"$path/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toUri.toString).toSet
  }

  /** Scheme-insensitive file identity (`file:///x` == `file:/x`) for
    * comparing manifest URIs (from `input_file_name()`) against listing
    * URIs (from `FileStatus`). */
  private def pathKey(uri: String): String = new java.net.URI(uri).getPath

  /**
   * The nightly-ingest shape: appends `df` as a NEW z-clustered batch of
   * `files` parquet files to an existing [[writeClustered]] layout and
   * commits a snapshot extending the live manifest with the new files'
   * stats rows — no existing data file or manifest row is rewritten, and
   * [[prunedRead]] stays exact over the union (spec-pinned). Each batch
   * is z-scaled on its OWN min/max bounds: clustering quality is
   * per-batch, manifest stats (the thing pruning reads) are exact
   * regardless.
   *
   * With a non-empty `streamId`, the commit is fenced: a `batchId` at or
   * below the highest already committed for that stream throws instead
   * of double-appending (callers that want skip-not-throw check
   * [[lastCommittedBatch]] first, as [[graft.streaming.LakehouseIngest]]
   * does).
   *
   * The new-file set is the before/after listing diff — driver-sized
   * here; a production writer would thread the committed file list out
   * of the write's commit protocol instead of listing. The stats pass
   * reads ONLY the new files.
   */
  def appendClustered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16, streamId: String = "",
      batchId: Long = -1L): Unit = {
    val spark = df.sparkSession
    val live = readManifest(spark, path)
    require(live.columns.toSet == statsOf(df.limit(0), zCols).columns.toSet,
      s"appendClustered: zCols $zCols do not match the manifest at $path " +
        "— an appended batch must carry stats for the SAME clustered " +
        "columns or pruning would silently skip it")
    // the DATA schema must match too, not just the stat columns: parquet
    // append happily lands mixed-schema files, and a later explicit-file
    // read reconciles them to the FIRST file's schema — an extra column
    // silently vanishes, a retyped one fails far from its cause. One
    // footer read of a live file, fail-loud here instead.
    val liveSchema = spark.read
      .parquet(live.select(col("file")).head().getString(0)).schema
    val batchSchema = df.schema
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    require(shape(liveSchema) == shape(batchSchema),
      s"appendClustered: batch schema ${batchSchema.simpleString} does " +
        s"not match the layout's data schema ${liveSchema.simpleString} " +
        s"at $path — schema evolution needs an explicit rewrite, not a " +
        "silent mixed-schema append")
    if (streamId.nonEmpty && batchId <= lastCommittedBatch(spark, path, streamId))
      throw new IllegalStateException(
        s"appendClustered: batch $batchId of stream '$streamId' is already " +
          s"committed at $path — a re-delivered batch must be skipped, " +
          "not re-appended")
    val before = listData(spark, path)
    Zorder.writeZOrderedAppend(df, zCols, s"$path/data", files, bits)
    val newFiles = (listData(spark, path) -- before).toSeq
    require(newFiles.nonEmpty, "appendClustered: the write added no files")
    val added = statsOf(spark.read.parquet(newFiles: _*), zCols)
      .select(live.columns.map(col): _*)
    commitVersion(spark, path, live.unionByName(added), "append",
      streamId, batchId)
  }

  /**
   * OPTIMIZE-style compaction: data files holding fewer than `minRows`
   * rows (the small-batch debris [[appendClustered]] accumulates) are
   * re-clustered together into `files` new z-ordered files; every other
   * data file — and its manifest row — is untouched. Returns
   * (filesCompacted, filesWritten); a no-op (0 or 1 small file) returns
   * without committing.
   *
   * Scale shape: the decision pass is the driver-side manifest replay
   * (#files rows); only the small files' bytes are read and rewritten.
   * The compacted originals are NOT deleted — the new snapshot just stops
   * referencing them, so a reader pinned on the previous version (or one
   * that resolved "latest" a moment before this commit) keeps reading a
   * consistent, complete snapshot. [[vacuum]] reclaims the superseded
   * bytes once no retained version references them.
   */
  def compact(spark: SparkSession, path: String, zCols: Seq[String],
      minRows: Long, files: Int, bits: Int = 16): (Int, Int) = {
    val m = readManifest(spark, path)
    require(m.columns.contains("n_rows"),
      s"manifest at $path has no n_rows column")
    val small = m.filter(col("n_rows") < minRows)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    if (small.size <= 1) return (0, 0)
    val before = listData(spark, path)
    Zorder.writeZOrderedAppend(spark.read.parquet(small: _*), zCols,
      s"$path/data", files, bits)
    val newFiles = (listData(spark, path) -- before).toSeq
    val kept = m.filter(!col("file").isin(small: _*))
    val replacement = kept.unionByName(
      statsOf(spark.read.parquet(newFiles: _*), zCols)
        .select(kept.columns.map(col): _*))
    commitVersion(spark, path, replacement, "compact", "", -1L)
    (small.size, newFiles.size)
  }

  /** Ops that REWRITE existing rows into new files (vs append new data).
    * [[addedFilesSince]] skips them — feeding a rewrite downstream would
    * double-count rows the consumer already saw. `upsert` is classified
    * rewrite CONSERVATIVELY: its inserts never reach the append feed
    * (insert-only flows should use [[appendClustered]]), but a consumer
    * is never double-fed — the safe side of the trade a full CDF would
    * resolve with per-row change types. */
  private val RewriteOps = Set("compact", "delete", "upsert")

  /**
   * Copy-on-write UPSERT (MERGE, latest-wins by key): every existing
   * row whose `keyCols` tuple appears in `updates` is replaced WHOLESALE
   * by the update rows carrying that key, and update keys absent from
   * the table are inserted. Only data files containing a matched key are
   * rewritten (survivor rows + all updates re-cluster together);
   * untouched files keep their bytes and manifest rows, and originals
   * stay for pinned readers until [[vacuum]]. Returns (filesRewritten,
   * rowsReplaced, rowsUpserted). SQL equality: null-keyed rows never
   * match — they are never replaced, and null-keyed updates insert.
   *
   * Scale shape: the update batch is assumed SMALL against the table
   * (the CDC-merge shape) — its distinct keys broadcast into both the
   * affected-file probe and the survivor anti-join, so the table is
   * never shuffled; the probe scan pushes nothing but reads only
   * `keyCols` + file names (column-pruned), and the rewrite reads only
   * the affected files.
   */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], files: Int = 4,
      bits: Int = 16): (Int, Long, Long) = {
    require(keyCols.nonEmpty, "upsertByKey: need at least one key column")
    if (updates.isEmpty) return (0, 0L, 0L)
    val m = readManifest(spark, path)
    val zCols = m.columns.collect {
      case c if c.startsWith("min_") => c.stripPrefix("min_")
    }.toSeq
    val allFiles = m.select(col("file")).collect().map(_.getString(0)).toSeq
    val data = spark.read.parquet(allFiles: _*)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    require(shape(data.schema) == shape(updates.schema),
      s"upsertByKey: updates schema ${updates.schema.simpleString} does " +
        s"not match the layout's ${data.schema.simpleString}")
    val keys = updates.select(keyCols.map(col): _*).distinct()
    val probe = data
      .select(input_file_name().as("_f") +: keyCols.map(col): _*)
      .join(broadcast(keys), keyCols, "left_semi")
      .groupBy(col("_f")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val affected = allFiles.filter(probe.contains)
    val replaced = probe.values.sum
    val before = listData(spark, path)
    val rewrite =
      if (affected.isEmpty) updates
      else spark.read.parquet(affected: _*)
        .join(broadcast(keys), keyCols, "left_anti")
        .unionByName(updates)
    Zorder.writeZOrderedAppend(rewrite, zCols, s"$path/data", files, bits)
    val newFiles = (listData(spark, path) -- before).toSeq
    require(newFiles.nonEmpty, "upsertByKey: the rewrite added no files")
    val kept =
      if (affected.isEmpty) m
      else m.filter(!col("file").isin(affected: _*))
    val next = kept.unionByName(
      statsOf(spark.read.parquet(newFiles: _*), zCols)
        .select(kept.columns.map(col): _*))
    commitVersion(spark, path, next, "upsert", "", -1L)
    (affected.size, replaced, updates.count())
  }

  /**
   * Copy-on-write DELETE: rows matching `pred` are removed by rewriting
   * ONLY the data files that contain a match — survivors re-cluster into
   * at most `files` new z-ordered files, every untouched file keeps its
   * bytes and manifest row, and the originals stay on disk for pinned
   * readers until [[vacuum]]. Returns (filesRewritten, rowsDeleted);
   * no match is a no-op with no commit.
   *
   * SQL DELETE semantics: a row is removed iff `pred` is TRUE — rows
   * where it evaluates null are kept. The affected-file probe is one
   * scan over the manifest's file set with `pred` pushed down (a
   * selective predicate on a clustered column touches few row groups);
   * the rewrite reads only the affected files. Clustered columns are
   * recovered from the manifest, so the caller states nothing twice.
   */
  def deleteWhere(spark: SparkSession, path: String,
      pred: org.apache.spark.sql.Column, files: Int = 4,
      bits: Int = 16): (Int, Long) = {
    val m = readManifest(spark, path)
    val zCols = m.columns.collect {
      case c if c.startsWith("min_") => c.stripPrefix("min_")
    }.toSeq
    val allFiles = m.select(col("file")).collect().map(_.getString(0)).toSeq
    if (allFiles.isEmpty) return (0, 0L)
    val hits = spark.read.parquet(allFiles: _*)
      .filter(pred)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (hits.isEmpty) return (0, 0L)
    val affected = allFiles.filter(f => hits.contains(f))
    val before = listData(spark, path)
    val survivors = spark.read.parquet(affected: _*)
      .filter(!(pred <=> lit(true)))
    val anySurvivor = !survivors.isEmpty
    if (anySurvivor)
      Zorder.writeZOrderedAppend(survivors, zCols, s"$path/data", files, bits)
    val newFiles = (listData(spark, path) -- before).toSeq
    val kept = m.filter(!col("file").isin(affected: _*))
    val next =
      if (newFiles.isEmpty) kept
      else kept.unionByName(
        statsOf(spark.read.parquet(newFiles: _*), zCols)
          .select(kept.columns.map(col): _*))
    commitVersion(spark, path, next, "delete", "", -1L)
    (affected.size, hits.values.sum)
  }

  /**
   * Reclaims storage the log no longer needs: data files referenced by
   * NONE of the last `retainVersions` committed snapshots (compacted-away
   * originals, crashed-append leftovers, any orphan under `data/`),
   * superseded versions' manifest parquet, and marker-less
   * crashed-attempt version dirs. Commit MARKERS are kept for every
   * version so [[lastCommittedBatch]] fencing survives. Returns
   * (dataFilesDeleted, manifestsPruned).
   *
   * Contract: snapshots older than the retained window stop being
   * readable — the same retention trade Delta's `VACUUM` makes. Run it
   * from the single writer (or its maintenance window), sized so
   * `retainVersions` outlives the longest concurrent reader.
   */
  def vacuum(spark: SparkSession, path: String,
      retainVersions: Int = 1): (Int, Int) = {
    require(retainVersions >= 1,
      s"vacuum: retainVersions must be >= 1, got $retainVersions")
    val fs = fsOf(spark, path)
    val committed = committedVersions(spark, path)
    require(committed.nonEmpty, s"no committed lakehouse log at $path")
    val retained = committed.takeRight(retainVersions)
    val live: Set[String] = retained.flatMap { v =>
      manifestAt(spark, path, v).select(col("file")).collect()
        .map(r => pathKey(r.getString(0)))
    }.toSet
    val dead = listData(spark, path).toSeq.filterNot(f => live(pathKey(f)))
    dead.foreach(f => fs.delete(new Path(new java.net.URI(f)), false))
    val pruned = committed.dropRight(retainVersions).count { v =>
      val mp = new Path(versionDir(path, v), "manifest")
      fs.exists(mp) && fs.delete(mp, true)
    }
    fs.listStatus(new Path(logDir(path))).foreach { st =>
      st.getPath.getName match {
        case VersionDirRe(_) if !fs.exists(new Path(st.getPath, "_commit")) =>
          fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    (dead.size, pruned)
  }

  // ------------------------------------------------------------------
  // reads
  // ------------------------------------------------------------------

  /** Manifest replay: the data files whose `[min_c, max_c]` interval
    * overlaps `[lo, hi]` on `predCol`, plus the total file count.
    * Driver-sized by construction (one manifest row per file), so it is
    * collected ONCE and filtered on the driver — planning a pruned read
    * costs a single #files-row job, not one per derived statistic. */
  def selectFiles(spark: SparkSession, path: String, predCol: String,
      lo: Double, hi: Double): (Seq[String], Int) =
    selectFilesMulti(spark, path, Seq((predCol, lo, hi)))

  /** Multi-range manifest replay — the reason the data is Z-ORDERED
    * rather than sorted on one column: every file is a tight
    * hyper-rectangle in ALL clustered columns, so each predicate prunes
    * independently and a file survives only if it overlaps EVERY range
    * (intersection of per-column survivors). */
  def selectFilesMulti(spark: SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): (Seq[String], Int) =
    selectFilesIn(readManifest(spark, path), path, ranges)

  /** [[selectFilesMulti]] against a PINNED version — the planning half
    * of a time-travel read. */
  def selectFilesMultiAt(spark: SparkSession, path: String, version: Long,
      ranges: Seq[(String, Double, Double)]): (Seq[String], Int) =
    selectFilesIn(manifestAt(spark, path, version), path, ranges)

  private def selectFilesIn(m: DataFrame, path: String,
      ranges: Seq[(String, Double, Double)]): (Seq[String], Int) = {
    require(ranges.nonEmpty, "selectFilesMulti: need at least one range")
    ranges.foreach { case (c, _, _) =>
      require(m.columns.contains(s"min_$c"),
        s"manifest at $path has no stats for column '$c' — it was " +
          "not in the write's zCols")
    }
    // integral stats compare as LONGS against ceil/floor'd bounds — a
    // double cast would round a |value| > 2^53 min/max by up to ~1024,
    // which can push a file's rounded min past the query's hi and
    // silently prune a file the exact residual WOULD have matched (e.g.
    // raw 64-bit hash keys). Fractional stats compare as doubles.
    import org.apache.spark.sql.types._
    val integral = ranges.map { case (c, _, _) =>
      m.schema(s"min_$c").dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    val statCols = ranges.zipWithIndex.flatMap { case ((c, _, _), i) =>
      val cast = if (integral(i)) "long" else "double"
      Seq(col(s"min_$c").cast(cast).as(s"lo$i"),
        col(s"max_$c").cast(cast).as(s"hi$i"))
    }
    val rows = m.select(col("file") +: statCols: _*).collect()
    val kept = rows.toIndexedSeq
      .filter { r =>
        ranges.zipWithIndex.forall { case ((_, lo, hi), i) =>
          !r.isNullAt(2 * i + 1) && !r.isNullAt(2 * i + 2) && {
            if (integral(i))
              !(r.getLong(2 * i + 2) < math.ceil(lo).toLong ||
                r.getLong(2 * i + 1) > math.floor(hi).toLong)
            else
              !(r.getDouble(2 * i + 2) < lo || r.getDouble(2 * i + 1) > hi)
          }
        }
      }
      .map(_.getString(0))
    (kept, rows.length)
  }

  /**
   * Reads only the manifest-surviving files and applies the EXACT
   * predicate `predCol BETWEEN lo AND hi` — pruning is a superset filter
   * (file granularity), the residual filter restores row-exact
   * semantics, so the result is identical to a full scan + filter while
   * touching a fraction of the files (spec-pinned: fewer files than
   * written, same rows as the full scan).
   */
  def prunedRead(spark: SparkSession, path: String, predCol: String,
      lo: Double, hi: Double): DataFrame =
    prunedReadMulti(spark, path, Seq((predCol, lo, hi)))

  /** [[prunedRead]] against a PINNED version — time travel: replays the
    * snapshot as of `version` (from [[history]] or a reader's earlier
    * [[latestVersion]] resolve) with the same file skipping + exact
    * residual. Readable until [[vacuum]]'s retention window moves past
    * `version`. */
  def prunedReadAt(spark: SparkSession, path: String, version: Long,
      predCol: String, lo: Double, hi: Double): DataFrame =
    prunedFrom(spark, path,
      selectFilesMultiAt(spark, path, version, Seq((predCol, lo, hi)))._1,
      Seq((predCol, lo, hi)))

  /** [[prunedRead]] over a conjunction of ranges — manifest pruning on
    * every clustered column at once, then the exact residual AND. */
  def prunedReadMulti(spark: SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): DataFrame =
    prunedFrom(spark, path, selectFilesMulti(spark, path, ranges)._1, ranges)

  private def prunedFrom(spark: SparkSession, path: String,
      files: Seq[String],
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    if (files.isEmpty)
      return spark.read.parquet(s"$path/data").filter(lit(false))
    val scan = spark.read.parquet(files: _*)
    // each residual predicate must compare in its column's NATIVE type: a
    // double bound against an integral column would cast the COLUMN,
    // which disables parquet row-group pushdown — manifest pruning would
    // then skip files only to decode every surviving row group. Integral
    // bounds tighten by ceil/floor (same row set, pushdown kept).
    import org.apache.spark.sql.types._
    val exact = ranges.map { case (c, lo, hi) =>
      scan.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          col(c) >= lit(math.ceil(lo).toLong) &&
            col(c) <= lit(math.floor(hi).toLong)
        // float bounds only when the doubles are float-exact (same row
        // set); an inexact bound falls through to the double compare —
        // correct, just no row-group pushdown on that one predicate
        case FloatType
            if lo.toFloat.toDouble == lo && hi.toFloat.toDouble == hi =>
          col(c) >= lit(lo.toFloat) && col(c) <= lit(hi.toFloat)
        case _ => col(c) >= lit(lo) && col(c) <= lit(hi)
      }
    }.reduce(_ && _)
    scan.filter(exact)
  }

  // ------------------------------------------------------------------
  // incremental consumption
  // ------------------------------------------------------------------

  /** Data files ADDED by each committed version in `(sinceVersion,
    * latest]`, as (version, files) pairs — the manifest diff a
    * downstream incremental job replays instead of rescanning the
    * table. REWRITE versions (`compact`, `delete`) are EXCLUDED: they
    * re-file rows the consumer already saw, and double-counting them is
    * exactly the bug this op-aware diff prevents (the reason commits
    * record their op at all) — so this is an APPEND feed; deletions are
    * not retracted downstream, the Delta CDF trade this module does not
    * take on. Driver-sized:
    * #versions manifest replays. Versions whose manifests were vacuumed
    * away fail loudly — consume before the retention window passes. */
  def addedFilesSince(spark: SparkSession, path: String,
      sinceVersion: Long): Seq[(Long, Seq[String])] = {
    val fs = fsOf(spark, path)
    val versions = committedVersions(spark, path).filter(_ > sinceVersion)
    def filesOf(v: Long): Set[String] = {
      require(fs.exists(new Path(versionDir(path, v), "manifest")),
        s"addedFilesSince: version $v's manifest was vacuumed — " +
          "incremental consumers must keep up with the retention window")
      manifestAt(spark, path, v).select(col("file")).collect()
        .map(_.getString(0)).toSet
    }
    versions.foldLeft((Seq.empty[(Long, Seq[String])],
        Option.empty[Set[String]])) { case ((acc, prevOpt), v) =>
      val cur = filesOf(v)
      val prev = prevOpt.getOrElse(
        if (v == 0) Set.empty[String]
        else filesOf(v - 1))
      val info = readCommit(fs, path, v)
      val added =
        if (RewriteOps.contains(info.op)) Seq.empty
        else (cur -- prev).toSeq.sorted
      (acc :+ (v, added), Some(cur))
    }._1.filter(_._2.nonEmpty)
  }

  /** The rows added since `sinceVersion` — reads ONLY the files
    * [[addedFilesSince]] surfaces (create + append commits; compaction
    * rewrites excluded), so a nightly downstream pass costs the new
    * bytes, never a table rescan. Empty frame (with the table's schema)
    * when nothing new landed. */
  def changesSince(spark: SparkSession, path: String,
      sinceVersion: Long): DataFrame = {
    val files = addedFilesSince(spark, path, sinceVersion).flatMap(_._2)
    if (files.isEmpty) spark.read.parquet(s"$path/data").filter(lit(false))
    else spark.read.parquet(files: _*)
  }

  // ------------------------------------------------------------------
  // typed reads (string / date / timestamp clustered columns)
  // ------------------------------------------------------------------

  /** Parses each bound string in its column's type and fails loudly on a
    * bound the type can't hold (a silent null would prune every file
    * instead). Evaluated DRIVER-SIDE through Catalyst's own Cast — same
    * parsing semantics the plan would use, zero Spark jobs: read
    * planning stays a pure manifest replay. Returns typed literal
    * Columns, so the residual filter carries native-type constants
    * (parquet row-group pushdown needs no constant-folding help). */
  private def typedBounds(spark: SparkSession,
      ranges: Seq[(String, String, String)],
      dtOf: String => org.apache.spark.sql.types.DataType)
      : Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    ranges.map { case (c, lo, hi) =>
      val dt = dtOf(c)
      def parse(s: String): org.apache.spark.sql.Column = {
        val v =
          try Cast(Literal(s), dt, tz).eval()
          catch { case e: Exception => throw new IllegalArgumentException(
            s"typed pruning: bound '$s' does not parse as the type of " +
              s"column '$c' (${dt.simpleString})", e) }
        require(v != null,
          s"typed pruning: bound '$s' does not parse as the type of " +
            s"column '$c' (${dt.simpleString})")
        org.apache.spark.sql.graft.Bridge.column(Literal(v, dt))
      }
      (parse(lo), parse(hi))
    }
  }

  /** [[selectFilesMulti]] for string / date / timestamp clustered
    * columns: bounds are given as strings parsed in each stat column's
    * NATIVE type (`"2026-01-14"` against a date column, a plain string
    * against a string column — compared with Spark's binary collation,
    * the same order the z-writer clustered by). Equality is `lo == hi`.
    * Exact-integral bounds work too; FRACTIONAL numeric bounds belong to
    * the Double form, whose ceil/floor tightening this path has no need
    * to replicate. */
  def selectFilesTyped(spark: SparkSession, path: String,
      ranges: Seq[(String, String, String)]): (Seq[String], Int) =
    selectFilesTypedIn(spark, readManifest(spark, path), path, ranges)

  /** [[selectFilesTyped]] against a PINNED version. */
  def selectFilesTypedAt(spark: SparkSession, path: String, version: Long,
      ranges: Seq[(String, String, String)]): (Seq[String], Int) =
    selectFilesTypedIn(spark, manifestAt(spark, path, version), path, ranges)

  private def selectFilesTypedIn(spark: SparkSession, m: DataFrame,
      path: String,
      ranges: Seq[(String, String, String)]): (Seq[String], Int) = {
    require(ranges.nonEmpty, "selectFilesTyped: need at least one range")
    ranges.foreach { case (c, _, _) =>
      require(m.columns.contains(s"min_$c"),
        s"manifest at $path has no stats for column '$c' — it was " +
          "not in the write's zCols")
    }
    val lits = typedBounds(spark, ranges, c => m.schema(s"min_$c").dataType)
    // a file survives only if it overlaps EVERY range; null stats mean an
    // all-null column in that file — no row can match, prune it
    val keep = ranges.zip(lits).map { case ((c, _, _), (loL, hiL)) =>
      col(s"max_$c") >= loL && col(s"min_$c") <= hiL
    }.reduce(_ && _)
    val rows = m.select(col("file"),
      coalesce(keep, lit(false)).as("keep")).collect()
    (rows.toIndexedSeq.filter(_.getBoolean(1)).map(_.getString(0)),
      rows.length)
  }

  /** [[prunedReadMulti]] with [[selectFilesTyped]] bounds — the data-card
    * read path whose first predicate is a date or a category, not a
    * number. The residual compares in each column's native type (the
    * bound literal is cast, never the column), so parquet row-group
    * pushdown survives alongside the manifest-level file skipping. */
  def prunedReadTyped(spark: SparkSession, path: String,
      ranges: Seq[(String, String, String)]): DataFrame =
    prunedTypedFrom(spark, path, selectFilesTyped(spark, path, ranges)._1,
      ranges)

  /** [[prunedReadTyped]] against a PINNED version — typed time travel,
    * same retention contract as [[prunedReadAt]]. */
  def prunedReadTypedAt(spark: SparkSession, path: String, version: Long,
      ranges: Seq[(String, String, String)]): DataFrame =
    prunedTypedFrom(spark, path,
      selectFilesTypedAt(spark, path, version, ranges)._1, ranges)

  private def prunedTypedFrom(spark: SparkSession, path: String,
      files: Seq[String],
      ranges: Seq[(String, String, String)]): DataFrame = {
    if (files.isEmpty)
      return spark.read.parquet(s"$path/data").filter(lit(false))
    val scan = spark.read.parquet(files: _*)
    val lits = typedBounds(spark, ranges, c => scan.schema(c).dataType)
    val exact = ranges.zip(lits).map { case ((c, _, _), (loL, hiL)) =>
      col(c) >= loL && col(c) <= hiL
    }.reduce(_ && _)
    scan.filter(exact)
  }
}
