package graft.operators

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
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
 *                                     + nFiles/nRows + data schema
 *                                     + upsert insert-file list
 * }}}
 *
 * == Schema ==
 *
 * Each commit records the snapshot's DATA SCHEMA; every read resolves
 * files against the recorded schema, so ADDITIVE evolution just works:
 * an append may add columns (never drop or retype — fail-loud), files
 * written before the column existed null-fill it, time travel replays
 * each snapshot under its own schema, and [[compact]] physically
 * normalizes old files as a side effect. The Delta/Iceberg
 * schema-in-the-log design, reduced to the additive case.
 *
 * A version is STAGED complete (manifest parquet + `_commit` marker) in a
 * `_log/_tmp-<uuid>` directory and becomes visible atomically when the
 * whole directory renames into place — rename-to-a-fresh-name is atomic
 * on HDFS and local FS, and the rename runs through `FileContext` with
 * `Rename.NONE` semantics so a destination that already exists FAILS the
 * rename instead of merging into it. Readers resolve "latest committed
 * version" once per read and replay exactly that snapshot, which gives
 * SNAPSHOT ISOLATION through concurrent mutations: no mutation ever
 * rewrites or deletes a file an existing snapshot references — superseded
 * files are reclaimed only by an explicit [[vacuum]]. A crashed attempt
 * leaves only `_tmp-*` staging debris (never a half-visible version);
 * [[vacuum]] sweeps it.
 *
 * == Concurrency ==
 *
 * APPENDS are optimistically concurrent: [[appendClustered]] writes its
 * data files once, then loops { resolve latest, extend that manifest,
 * commit at latest+1 } — a lost race (another writer took the version
 * slot first) re-resolves and retries, because append manifests are
 * purely ADDITIVE: re-deriving "fresh live + my new rows" is always
 * correct whatever landed in between. Two interleaved appenders (a
 * stream plus a nightly backfill — the normal production shape) both
 * land, on a linear log.
 *
 * The REWRITE ops resolve lost races with FILE-SET conflict detection
 * (the Delta model). [[compact]] removes only files it read and adds
 * files nobody else references, so it commutes with ANY interleaved
 * commit — append, delete, upsert, another compact — that left its
 * read set fully referenced by the new live manifest; it rebuilds
 * against the new head and retries (in-stream maintenance survives a
 * nightly backfill appender AND a concurrent CDC merge on other
 * files). [[deleteWhere]] and [[upsertByKey]] additionally need the
 * interlopers' ADDED files to be provably unable to interact — an
 * added row could match the delete predicate or carry an update key —
 * and the manifest's per-file min/max stats give the proof: when every
 * concurrently-added file's stat ranges are DISJOINT from the delete's
 * `pruneRanges` (resp. the upsert batch's key bounds), and the op's
 * read set is still live, the rewrite rebases exactly like compact
 * (the stats-disjointness argument Delta uses to avoid
 * ConcurrentAppendException); removals OUTSIDE the read set are safe
 * by construction (see `commitRewrite`'s doc for the argument).
 * Overlapping or unprovable cases (a delete without `pruneRanges`, an
 * upsert whose key columns carry no manifest stats, an interloper that
 * rewrote a file this op read) stay fail-loud, as does any race with a
 * whole-table [[replaceClustered]]; [[writeClustered]] is destructive
 * create-table and participates in no race resolution. A lost race
 * that cannot rebase throws BEFORE anything becomes visible.
 * (On an object store without atomic rename the same caveat applies as
 * to Delta-on-S3: the final rename needs the store's conditional-put —
 * out of scope here.)
 *
 * Each `_commit` records a `(streamId, batchId)` pair, the Delta `txn`
 * action analog: [[graft.streaming.LakehouseIngest]] fences re-delivered
 * `foreachBatch` batches on it, upgrading streaming ingest from
 * at-least-once to exactly-once under deterministic replay (spec-pinned
 * by replaying a batch and observing unchanged row counts).
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

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.operators.Lakehouse")

  /** Default [[upsertByKey]] small-batch contract cap. */
  val DefaultMaxProbeKeys: Long = 1000000L

  // ------------------------------------------------------------------
  // log protocol
  // ------------------------------------------------------------------

  private val VersionDirRe = "^v(\\d{10})$".r

  private def logDir(path: String) = s"$path/_log"
  private def versionDir(path: String, v: Long) = f"${logDir(path)}/v$v%010d"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A commit lost its version slot to a concurrent writer. Additive
    * (append) commits catch this and retry against the new latest;
    * rewrite commits let it propagate — fail-loud by design. */
  final class CommitConflictException(msg: String)
    extends IllegalStateException(msg)

  /** Committed versions, ascending — a directory listing of `_log`
    * filtered to dirs whose `_commit` marker exists (staging debris and
    * torn pre-rename states carry no marker). Driver-sized: #versions
    * entries. */
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
    * `(version, op, stream_id, batch_id, n_files, n_rows)`, the counts
    * being each version's SNAPSHOT TOTALS (its whole manifest, not the
    * commit's delta). They are recorded INTO each `_commit` marker at
    * commit time — surviving [[vacuum]] alongside the marker — so this is
    * a pure driver-side marker replay: ZERO Spark jobs however old the
    * table (spec-pinned with a job listener) — not one manifest
    * aggregation job per version, which on a year-old table would be
    * hundreds of driver-blocking jobs for one DESCRIBE. Markers written
    * before counts existed fall back to their retained manifest (null
    * counts if vacuumed away). */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    committedVersions(spark, path).map { v =>
      val c = readCommit(fs, path, v)
      val counts = (c.nFiles, c.nRows) match {
        case (Some(f), Some(r)) => (Some(f), Some(r))
        case _ => // legacy marker without counts: one manifest replay
          if (fs.exists(new Path(versionDir(path, v), "manifest"))) {
            val m = manifestAt(spark, path, v)
              .agg(count(lit(1)), coalesce(sum(col("n_rows")), lit(0L))).head()
            (Some(m.getLong(0)), Some(m.getLong(1)))
          } else (None, None)
      }
      (v, c.op, c.streamId, c.batchId, counts._1, counts._2)
    }.toDF("version", "op", "stream_id", "batch_id", "n_files", "n_rows")
  }

  private case class CommitInfo(op: String, streamId: String, batchId: Long,
      nFiles: Option[Long], nRows: Option[Long], insertFiles: Seq[String],
      dataSchema: Option[org.apache.spark.sql.types.StructType],
      postimageFiles: Seq[String], deleteFiles: Seq[String],
      writerToken: String)

  private def readCommit(fs: FileSystem, path: String, v: Long): CommitInfo = {
    val in = fs.open(new Path(versionDir(path, v), "_commit"))
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    def optLong(k: String) = Option(props.getProperty(k)).map(_.toLong)
    def fileList(prefix: String): Seq[String] = {
      val n = Option(props.getProperty(s"n${prefix.capitalize}Files"))
        .map(_.toInt).getOrElse(0)
      (0 until n).map(i => props.getProperty(s"${prefix}File.$i"))
    }
    CommitInfo(props.getProperty("op", ""), props.getProperty("streamId", ""),
      props.getProperty("batchId", "-1").toLong,
      optLong("nFiles"), optLong("nRows"),
      fileList("insert"),
      Option(props.getProperty("dataSchema")).map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]),
      fileList("postimage"), fileList("delete"),
      props.getProperty("writerToken", ""))
  }

  /** The table's data schema as of version `v`, as recorded in that
    * commit's marker — the schema every read of that snapshot resolves
    * against, so files written BEFORE a column was added null-fill it
    * instead of (parquet first-file semantics) silently dropping it.
    * None on markers that predate schema tracking (readers fall back to
    * file-footer schemas, the pre-evolution behavior). Driver-side: one
    * ~1 KB marker read, zero Spark jobs. */
  def dataSchemaAt(spark: SparkSession, path: String, v: Long)
      : Option[org.apache.spark.sql.types.StructType] =
    if (v < 0) None
    else readCommit(fsOf(spark, path), path, v).dataSchema

  /** [[dataSchemaAt]] of the latest committed version. */
  def dataSchema(spark: SparkSession, path: String)
      : Option[org.apache.spark.sql.types.StructType] =
    dataSchemaAt(spark, path, latestVersion(spark, path))

  /** Stages `manifest` + marker as a complete version directory and
    * renames it into the `base + 1` slot. The rename is the commit
    * point: `FileContext` + `Rename.NONE` fails if the slot is taken
    * (it never merges into an existing directory, unlike
    * `FileSystem.rename`'s copy fallback), so a lost race throws
    * [[CommitConflictException]] with NOTHING visible — the staging
    * debris is cleaned up (best-effort; [[vacuum]] sweeps leftovers).
    * The marker records file/row counts (one tiny read of the just-
    * written single-file manifest — #files rows) so [[history]] never
    * has to replay manifests. */
  private[graft] def commitVersion(spark: SparkSession, path: String,
      manifest: DataFrame, op: String, streamId: String,
      batchId: Long, base: Long,
      insertFiles: Seq[String] = Nil,
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None,
      postimageFiles: Seq[String] = Nil,
      deleteFiles: Seq[String] = Nil,
      writerToken: String = "")
      : Long = {
    val fs = fsOf(spark, path)
    val v = base + 1
    val tmp = new Path(logDir(path),
      s"_tmp-${java.util.UUID.randomUUID().toString}")
    val vd = new Path(versionDir(path, v))
    try {
      manifest.coalesce(1).write.mode("error")
        .parquet(new Path(tmp, "manifest").toString)
      val counts = spark.read.parquet(new Path(tmp, "manifest").toString)
        .agg(count(lit(1)), coalesce(sum(col("n_rows")), lit(0L))).head()
      val props = new java.util.Properties()
      props.setProperty("op", op)
      props.setProperty("streamId", streamId)
      props.setProperty("batchId", batchId.toString)
      props.setProperty("nFiles", counts.getLong(0).toString)
      props.setProperty("nRows", counts.getLong(1).toString)
      // row-level CDF bookkeeping: an upsert commit's insert-only and
      // update-postimage batches ([[changesSince]] reads the former,
      // [[changesDetailed]] both), and a delete commit's deleted-row
      // sidecar files (under `_cdf/`, never in the data manifest)
      def putList(prefix: String, files: Seq[String]): Unit = {
        props.setProperty(s"n${prefix.capitalize}Files", files.size.toString)
        files.zipWithIndex.foreach { case (f, i) =>
          props.setProperty(s"${prefix}File.$i", f)
        }
      }
      putList("insert", insertFiles)
      putList("postimage", postimageFiles)
      putList("delete", deleteFiles)
      // writer identity, for retry loops to recognize their OWN landed
      // commit after an AMBIGUOUS rename (applied on the filesystem,
      // error reported to the client — the HDFS non-idempotent-RPC
      // hazard); without it a retry would re-commit the same extension
      // and duplicate manifest rows
      if (writerToken.nonEmpty) props.setProperty("writerToken", writerToken)
      // the snapshot's data schema (top-level nullable normalized — added
      // columns ARE null in pre-evolution files): reads resolve against
      // THIS, so those files null-fill instead of inheriting parquet's
      // first-file semantics
      dataSchema.foreach(s => props.setProperty("dataSchema",
        org.apache.spark.sql.types.StructType(
          s.fields.map(_.copy(nullable = true))).json))
      val out = fs.create(new Path(tmp, "_commit"), false)
      try props.store(out, null) finally out.close()
      // a version dir WITHOUT a marker cannot come from this protocol
      // (visibility is the whole-dir rename) — it is pre-protocol debris
      // or a torn copy; reclaim it rather than letting it wedge the slot
      if (fs.exists(vd) && !fs.exists(new Path(vd, "_commit")))
        fs.delete(vd, true)
      if (fs.exists(vd))
        throw new CommitConflictException(
          s"lakehouse log at $path: version $v was committed concurrently")
      val fc = FileContext.getFileContext(fs.getUri,
        spark.sparkContext.hadoopConfiguration)
      // ONLY a destination-exists outcome is a commit race. Any other
      // IOException (permissions, quota, a broken filesystem) propagates
      // as the infrastructure failure it is — reclassifying it as a
      // conflict would let retry/skip layers (commitAdditive,
      // LakehouseIngest.runMaintenance) indefinitely downgrade a
      // persistent FS failure to "lost a race"
      try fc.rename(tmp, vd, Options.Rename.NONE)
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new CommitConflictException(
            s"lakehouse log at $path: lost the race for version $v: $e")
        case e: org.apache.hadoop.fs.PathExistsException =>
          throw new CommitConflictException(
            s"lakehouse log at $path: lost the race for version $v: $e")
      }
      v
    } catch {
      case e: Throwable =>
        // leave no staging debris behind on any failure path (best-effort)
        try fs.delete(tmp, true) catch { case _: Exception => () }
        throw e
    }
  }

  /** Did OUR rename land at `slot` despite the client-side error? A
    * missing marker is a definitive NO (visibility is the whole-dir
    * rename — a committed slot always carries its marker); any other
    * IOException is retried a few times before failing LOUDLY, because
    * concluding "not mine" from a transient read error would let the
    * caller re-commit the same rows at the next slot (duplicated data),
    * the one corruption this probe exists to prevent. */
  private def ownsSlot(fs: FileSystem, path: String, slot: Long,
      token: String): Boolean = {
    var attempt = 0
    while (true) {
      attempt += 1
      try {
        return fs.exists(new Path(versionDir(path, slot), "_commit")) &&
          readCommit(fs, path, slot).writerToken == token
      } catch {
        case _: java.io.FileNotFoundException => return false
        case e: java.io.IOException =>
          if (attempt >= 3) throw new IllegalStateException(
            s"lakehouse log at $path: cannot read the commit marker at " +
              s"version $slot to determine whether a conflicted commit " +
              "was actually ours — refusing to retry (a blind retry " +
              "could duplicate the committed rows); inspect the log", e)
          Thread.sleep(25L * attempt)
      }
    }
    false // unreachable
  }

  /** The additive-commit retry loop: re-resolves latest, rebuilds the
    * manifest via `extend` (fresh live manifest in, extended manifest
    * out), and commits at latest+1; a [[CommitConflictException]] means
    * another writer took the slot — re-deriving from the NEW live
    * manifest is correct because the extension is purely additive, so
    * back off briefly and go again. `fence` re-runs each attempt (a
    * concurrent commit may have advanced this stream's batch high-water
    * mark).
    *
    * AMBIGUOUS-RENAME defense: every attempt carries one per-CALL writer
    * token into the marker; before retrying a conflict, the loop reads
    * the marker at the slot it just lost — if it carries OUR token, the
    * rename actually applied and the error was client-side only (the
    * HDFS non-idempotent-RPC hazard), so the commit is returned instead
    * of re-extending and duplicating the same manifest rows. */
  private def commitAdditive(spark: SparkSession, path: String,
      op: String, streamId: String, batchId: Long, maxAttempts: Int)(
      fence: () => Unit)(extend: (Long, DataFrame) =>
        (DataFrame, Option[org.apache.spark.sql.types.StructType])): Long = {
    val token = java.util.UUID.randomUUID().toString
    val fs = fsOf(spark, path)
    var attempt = 0
    while (true) {
      attempt += 1
      fence()
      val base = latestVersion(spark, path)
      require(base >= 0, s"no committed lakehouse log at $path")
      val live = manifestAt(spark, path, base)
      try {
        val (manifest, schema) = extend(base, live)
        return commitVersion(spark, path, manifest, op, streamId,
          batchId, base, dataSchema = schema, writerToken = token)
      } catch {
        case e: CommitConflictException =>
          val lostSlot = base + 1
          if (ownsSlot(fs, path, lostSlot, token)) return lostSlot
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"lakehouse log at $path: additive commit lost $maxAttempts " +
              s"races in a row — giving up", e)
          Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(5L, 50L))
      }
    }
    -1L // unreachable
  }

  /** Test seam: invoked before a COW rewrite's ([[deleteWhere]] /
    * [[upsertByKey]]) first commit attempt — lets a spec interleave a
    * concurrent commit deterministically into the rebase race window. */
  private[graft] var onRewriteBeforeCommit: () => Unit = () => ()

  /**
   * The REWRITE-commit loop with FILE-SET conflict resolution (the
   * Delta model), shared by [[deleteWhere]] and [[upsertByKey]]. A
   * lost race is rebased — the replacement manifest rebuilt against
   * the new live manifest, the interlopers' work riding along — ONLY
   * when the interleaved commits provably cannot interact with this
   * rewrite:
   *
   *  - no interloper is a whole-table REPLACE (nothing computed
   *    against the old table survives one);
   *  - the table schema did not move (this op's files were written
   *    under the base schema; committing them under a marker recording
   *    that schema would silently narrow a widened table);
   *  - this op's READ SET (`affected`) is still fully referenced by
   *    the new live manifest — the primary gate: any interloper that
   *    rewrote or dropped a file this op read (a delete/upsert/compact
   *    touching the same files) fails here, while one that touched
   *    only OTHER files passes (its removals cannot affect rows this
   *    op never read);
   *  - `addedOverlap(addedManifestRows)` returns None over EVERY file
   *    the interlopers ADDED (append batches, upsert postimage/insert
   *    files, delete survivor re-files, compaction outputs): the
   *    op-specific stats proof that NO added row can match the delete
   *    predicate / carry an update key. Some(diagnostic) — overlap,
   *    or no bound to reason with — fails loud with the diagnostic.
   *    (A compaction re-files rows from inside this op's range
   *    without changing them; its output overlaps the stats bound and
   *    fails CONSERVATIVELY — correct, just not maximally permissive.)
   *
   * Why removals outside the read set are safe: for a delete, an
   * interloper's removal can only take rows AWAY — it cannot create a
   * predicate match; for an upsert, every row carrying a matched
   * update key lives in this op's read set by the probe's construction
   * (pruneRanges contract included), so a removal touching such a row
   * necessarily touches the read set and trips the liveness gate, and
   * keys absent from the table (our inserts) have no rows to remove —
   * an interloper INSERTING one of our keys is caught by the
   * added-files proof instead.
   *
   * Carries the same ambiguous-rename writer-token defense as
   * [[commitAdditive]]/[[compact]]. Driver work per retry: #files-row
   * manifest replays plus whatever the overlap callback runs (one
   * manifest-sized job).
   */
  private def commitRewrite(spark: SparkSession, path: String, op: String,
      streamId: String, batchId: Long, base0: Long, m0: DataFrame,
      affected: Seq[String], newStats: Option[DataFrame],
      insertFiles: Seq[String], postimageFiles: Seq[String],
      deleteFiles: Seq[String], fence: () => Unit,
      addedOverlap: DataFrame => Option[String],
      maxAttempts: Int,
      // the schema the commit RECORDS — defaults to the base snapshot's
      // (a rewrite re-files existing rows); the empty-table insert-all
      // path overrides it with the batch's schema (the batch DEFINES
      // the table there). The schema-STABILITY race check below always
      // compares against the base snapshot's schema regardless.
      commitSchema: Option[org.apache.spark.sql.types.StructType] = null)
      : Long = {
    val fs = fsOf(spark, path)
    val token = java.util.UUID.randomUUID().toString
    val baseSchema = dataSchemaAt(spark, path, base0)
    val recordSchema =
      if (commitSchema == null) baseSchema else commitSchema
    var base = base0
    var live = m0
    var attempt = 0
    onRewriteBeforeCommit()
    while (true) {
      attempt += 1
      val kept =
        if (affected.isEmpty) live
        else live.filter(!col("file").isin(affected: _*))
      val next = newStats match {
        case Some(s) => kept.unionByName(s.select(kept.columns.map(col): _*))
        case None => kept
      }
      try {
        return commitVersion(spark, path, next, op, streamId, batchId, base,
          insertFiles = insertFiles, dataSchema = recordSchema,
          postimageFiles = postimageFiles, deleteFiles = deleteFiles,
          writerToken = token)
      } catch {
        case e: CommitConflictException =>
          // ambiguous rename: our commit may have landed with the error
          // reported client-side only — never re-commit our own rows
          if (ownsSlot(fs, path, base + 1, token)) return base + 1
          // a concurrent commit may have advanced this stream's batch
          // high-water mark — re-fence before reasoning about a rebase
          fence()
          val newBase = latestVersion(spark, path)
          val interlopers = committedVersions(spark, path)
            .filter(v => v > base && v <= newBase)
            .map(v => (v, readCommit(fs, path, v).op))
          // a REPLACE swapped the whole table — nothing this op computed
          // survives (the liveness check below would also catch it; the
          // explicit gate gives the honest diagnostic)
          val replaced = interlopers.filter(_._2 == "replace")
          if (replaced.nonEmpty) throw new CommitConflictException(
            s"lakehouse log at $path: $op lost the race to whole-table " +
              s"REPLACE commit(s) ${replaced.map(p =>
                s"v${p._1}").mkString(", ")} — re-run against the new head")
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"lakehouse log at $path: $op lost $maxAttempts commit races " +
              "in a row — giving up", e)
          if (dataSchemaAt(spark, path, newBase) != baseSchema)
            throw new CommitConflictException(
              s"lakehouse log at $path: $op lost the race to an append " +
                "that widened the table schema — this op's rewrite files " +
                "were written under the old schema; re-run against the " +
                "new head")
          val newLive = manifestAt(spark, path, newBase)
          val liveFiles = newLive.select(col("file")).collect()
            .map(r => pathKey(r.getString(0))).toSet
          val missing = affected.filterNot(f => liveFiles(pathKey(f)))
          if (missing.nonEmpty) throw new CommitConflictException(
            s"lakehouse log at $path: $op's read set lost ${missing.size} " +
              s"file(s) (e.g. ${missing.head}) from the live manifest — " +
              s"concurrent commit(s) ${interlopers.map(p =>
                s"v${p._1}:${p._2}").mkString(", ")} rewrote or dropped " +
              "files this op read; re-run against the new head")
          // the interlopers' new files: referenced by the new live
          // manifest, absent from the manifest this op read (our own
          // staged files are in neither — the commit failed). A
          // pure-removal interleave (a delete with no survivors) adds
          // NOTHING — then there is nothing to prove and even a
          // no-bound op (a delete without pruneRanges) rebases safely
          val added = newLive.join(
            live.select(col("file")), Seq("file"), "left_anti")
          if (!added.isEmpty) {
            // A commitSchema override (the empty-table insert-all path)
            // records the BATCH's schema — legal only while the batch is
            // the sole content. An interloper's added rows were written
            // under the base schema; rebasing a diverging batch schema
            // over them would silently narrow/retype their columns on
            // every recorded-schema read (the stability gate above only
            // proves the TABLE schema didn't move, not that the override
            // is compatible with it). Divergence is (name, type) SHAPE —
            // the same contract upsertByKey's own schema gate uses;
            // nullability/metadata differences (parquet round-trips are
            // always nullable) are benign.
            def shapeOf(o: Option[org.apache.spark.sql.types.StructType]) =
              o.map(_.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq)
            if (commitSchema != null && shapeOf(recordSchema) != shapeOf(baseSchema))
              throw new CommitConflictException(
                s"lakehouse log at $path: $op lost the race to concurrent " +
                  s"commit(s) ${interlopers.map(p =>
                    s"v${p._1}:${p._2}").mkString(", ")} that added files " +
                  "while this op would record the batch's own schema " +
                  s"(${recordSchema.map(_.simpleString)} != base " +
                  s"${baseSchema.map(_.simpleString)}) over the added rows — " +
                  "re-run against the new head")
            addedOverlap(added).foreach(diag =>
              throw new CommitConflictException(
                s"lakehouse log at $path: $op lost the race to concurrent " +
                  s"commit(s) ${interlopers.map(p =>
                    s"v${p._1}:${p._2}").mkString(", ")} whose added files " +
                  s"are not provably disjoint from the $op's scope — " +
                  s"$diag; re-run against the new head"))
          }
          base = newBase
          live = newLive
          // jittered backoff (the commitAdditive idiom): two symmetric
          // rewriters retrying in lockstep would otherwise burn the
          // whole attempt budget colliding on the same slots
          Thread.sleep(
            java.util.concurrent.ThreadLocalRandom.current().nextLong(5L, 50L))
      }
    }
    -1L // unreachable
  }

  /** Releases the cached blocks behind a `localCheckpoint()`ed frame.
    * The checkpoint persists its RDD at the executor storage layer (a
    * Dataset-level `unpersist` cannot see it), and a long-running
    * caller — a streaming MERGE ingest checkpointing per micro-batch —
    * would otherwise accumulate dead blocks until the driver GC'd the
    * frames. Best-effort: an already-released or non-checkpoint frame
    * is a no-op. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(false); ()
      case _ => ()
    } catch { case _: Exception => () }

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
      "create", streamId, batchId, base = -1L,
      dataSchema = Some(df.schema))
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

  /** Data-file listing (driver-side, manifest-replay sized). Used only
    * by [[vacuum]]'s orphan sweep — mutations know their own written
    * files exactly (see [[writeBatch]]). */
  private def listData(spark: SparkSession, path: String): Set[String] = {
    val p = new Path(s"$path/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).iterator
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toUri.toString).toSet
  }

  /** Scheme-insensitive file identity (`file:///x` == `file:/x`) for
    * comparing manifest URIs (from `input_file_name()`) against listing
    * URIs (from `FileStatus`). */
  private def pathKey(uri: String): String = new java.net.URI(uri).getPath

  /** Reads data `files` resolved against version `v`'s RECORDED schema
    * when the marker carries one: files written before a column was
    * added null-fill it (parquet by-name resolution), instead of the
    * scan inheriting whatever the first listed file happens to contain.
    * Legacy markers (pre-tracking) fall back to footer schemas — the
    * pre-evolution behavior, safe because those tables were written
    * under the schema-equality contract. Empty `files` yields an empty
    * frame with the snapshot's schema. */
  private def readData(spark: SparkSession, path: String, v: Long,
      files: Seq[String]): DataFrame =
    dataSchemaAt(spark, path, v) match {
      case Some(s) =>
        if (files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        else spark.read.schema(s).parquet(files: _*)
      case None =>
        if (files.isEmpty)
          spark.read.parquet(s"$path/data").filter(lit(false))
        else spark.read.parquet(files: _*)
    }

  /** Writes `df` as a z-clustered batch via a private staging dir, then
    * moves each part file into `path/data` and returns EXACTLY the moved
    * files. The written-file set is known by construction, never inferred
    * from a before/after listing diff — under a CONCURRENT appender a
    * listing diff would claim the other writer's files and commit
    * duplicate manifest rows for them (double reads). Part-file names are
    * job-UUID unique, so the per-file renames cannot collide; a crash
    * leaves only `_stage-*` debris outside `data/`, invisible to every
    * reader and swept by [[vacuum]]. */
  private def writeBatch(spark: SparkSession, path: String, df: DataFrame,
      zCols: Seq[String], files: Int, bits: Int): Seq[String] = {
    val fs = fsOf(spark, path)
    val stage = new Path(path,
      s"_stage-${java.util.UUID.randomUUID().toString}")
    try {
      Zorder.writeZOrdered(df, zCols, stage.toString, files, bits)
      val dataDir = new Path(s"$path/data")
      fs.mkdirs(dataDir)
      fs.listStatus(stage).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map { s =>
          val dst = new Path(dataDir, s.getPath.getName)
          require(fs.rename(s.getPath, dst),
            s"writeBatch: rename ${s.getPath} -> $dst failed")
          fs.makeQualified(dst).toUri.toString
        }
    } finally {
      try fs.delete(stage, true) catch { case _: Exception => () }
    }
  }

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
   * CONCURRENT-SAFE: appends are commutative, so a lost commit race
   * re-resolves the (now newer) live manifest and retries — see the
   * class doc's concurrency section. Two interleaved appenders both
   * land on a linear log (spec-pinned). The data files are written
   * once, before the retry loop; only the #files-row manifest commit
   * retries.
   *
   * With a non-empty `streamId`, the commit is fenced: a `batchId` at or
   * below the highest already committed for that stream throws instead
   * of double-appending (callers that want skip-not-throw check
   * [[lastCommittedBatch]] first, as [[graft.streaming.LakehouseIngest]]
   * does). The fence re-checks on every retry.
   *
   * The batch frame is evaluated up to three times by the z-clustered
   * write (bounds aggregation + range sampling + the write itself) —
   * a caller whose batch is an expensive upstream pipeline should
   * `localCheckpoint()` it first (the rewrite ops do this internally
   * for their bounded affected-file reads; an append batch's size is
   * the caller's to judge).
   *
   * SCHEMA EVOLUTION is additive-only: the batch must carry every
   * existing column with its exact type (a retype or drop fails loudly,
   * far from nothing — a later explicit-file read would otherwise
   * reconcile mixed files to the FIRST file's schema and silently lose a
   * column), and may ADD new columns — the commit records the widened
   * schema, and every read resolves against the recorded schema so
   * pre-evolution files null-fill the added columns. The widened schema
   * re-derives on every retry: a concurrent appender may itself have
   * widened the table.
   */
  def appendClustered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16, streamId: String = "",
      batchId: Long = -1L, maxAttempts: Int = 20): Unit = {
    val spark = df.sparkSession
    val live0 = readManifest(spark, path)
    require(live0.columns.toSet == statsOf(df.limit(0), zCols).columns.toSet,
      s"appendClustered: zCols $zCols do not match the manifest at $path " +
        "— an appended batch must carry stats for the SAME clustered " +
        "columns or pruning would silently skip it")
    // additive-evolution check + widened-schema derivation against a
    // given base version. The table schema comes from the commit marker
    // — emptiness from the marker's nFiles too, so the common (schema-
    // tracked) path decides with ZERO Spark jobs; only a legacy
    // (pre-tracking) marker probes the manifest and one live-file
    // footer. An EMPTY manifest (legal after a wipe-delete) has nothing
    // to conflict with — the batch defines the schema.
    def widen(base: Long, live: DataFrame)
        : Option[org.apache.spark.sql.types.StructType] = {
      val info = readCommit(fsOf(spark, path), path, base)
      val tableSchema =
        if (info.nFiles.contains(0L)) None
        else info.dataSchema.orElse {
          val probeFile = live.select(col("file")).limit(1).collect()
          if (probeFile.isEmpty) None
          else Some(spark.read.parquet(probeFile(0).getString(0)).schema)
        }
      tableSchema match {
        case None => Some(df.schema)
        case Some(t) =>
          val batch = df.schema.fields.map(f => f.name -> f.dataType).toMap
          t.fields.foreach { f =>
            batch.get(f.name) match {
              case None => throw new IllegalArgumentException(
                s"appendClustered: batch is missing existing column " +
                  s"'${f.name}' at $path — evolution is additive-only " +
                  "(columns can be added, never dropped)")
              case Some(dt) => require(dt == f.dataType,
                s"appendClustered: column '${f.name}' is ${f.dataType
                  .simpleString} in the table but ${dt.simpleString} in " +
                  s"the batch at $path — a retype needs an explicit " +
                  "rewrite (replaceClustered), not an append")
            }
          }
          val addedCols =
            df.schema.fields.filterNot(f => t.fieldNames.contains(f.name))
          Some(org.apache.spark.sql.types.StructType(t.fields ++ addedCols))
      }
    }
    widen(latestVersion(spark, path), live0) // fail fast, before the write
    def fence(): Unit =
      if (streamId.nonEmpty &&
          batchId <= lastCommittedBatch(spark, path, streamId))
        throw new IllegalStateException(
          s"appendClustered: batch $batchId of stream '$streamId' is already " +
            s"committed at $path — a re-delivered batch must be skipped, " +
            "not re-appended")
    fence()
    val newFiles = writeBatch(spark, path, df, zCols, files, bits)
    require(newFiles.nonEmpty, "appendClustered: the write added no files")
    val added = statsOf(spark.read.parquet(newFiles: _*), zCols)
      .select(live0.columns.map(col): _*)
    commitAdditive(spark, path, "append", streamId, batchId,
      maxAttempts)(() => fence())((base, live) =>
      (live.unionByName(added), widen(base, live)))
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
   *
   * CONCURRENCY — file-set conflict detection (the Delta model):
   * compaction removes only files it read and adds files nobody else
   * references, so it is COMMUTATIVE with any interleaved commit that
   * left its read set alone. On a lost commit race, if every file this
   * compaction read is still referenced by the new live manifest, the
   * replacement is rebuilt against that manifest (the interlopers'
   * work — appended batches, another range's delete or CDC merge —
   * rides along untouched) and the commit retries at the new head.
   * An interloper that rewrote or dropped a read-set file (a
   * delete/upsert/compact overlapping the same small files), or a
   * whole-table replace, stays fail-loud [[CommitConflictException]]:
   * replaying against those could resurrect rows. The already-written
   * compacted files are reused across retries — only the #files-row
   * manifest commit repeats.
   */
  def compact(spark: SparkSession, path: String, zCols: Seq[String],
      minRows: Long, files: Int, bits: Int = 16,
      maxAttempts: Int = 10): (Int, Int) = {
    val base0 = latestVersion(spark, path)
    require(base0 >= 0, s"no committed lakehouse log at $path")
    val m0 = manifestAt(spark, path, base0)
    require(m0.columns.contains("n_rows"),
      s"manifest at $path has no n_rows column")
    val small = m0.filter(col("n_rows") < minRows)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    if (small.size <= 1) return (0, 0)
    // read under the recorded schema: compaction NORMALIZES pre-evolution
    // small files to the current schema as a side effect. Materialized
    // ONCE (localCheckpoint): the z-write evaluates its input three
    // times (bounds agg + range sampling + write), and the small files
    // — bounded bytes by the minRows selection — should be scanned
    // once, not thrice
    val newFiles = {
      val input = readData(spark, path, base0, small).localCheckpoint()
      try writeBatch(spark, path, input, zCols, files, bits)
      finally releaseCheckpoint(input) // the in-stream maintenance loop
      // compacts every few batches — dead blocks must not accumulate
    }
    val newStats = statsOf(spark.read.parquet(newFiles: _*), zCols)
    onCompactBeforeCommit()
    val fs = fsOf(spark, path)
    val token = java.util.UUID.randomUUID().toString
    var base = base0
    var m = m0
    var attempt = 0
    while (true) {
      attempt += 1
      val kept = m.filter(!col("file").isin(small: _*))
      val replacement =
        kept.unionByName(newStats.select(kept.columns.map(col): _*))
      try {
        commitVersion(spark, path, replacement, "compact", "", -1L, base,
          dataSchema = dataSchemaAt(spark, path, base),
          writerToken = token)
        return (small.size, newFiles.size)
      } catch {
        case e: CommitConflictException =>
          // ambiguous rename: our commit may have landed with the error
          // reported client-side only — never re-commit our own rows
          if (ownsSlot(fs, path, base + 1, token))
            return (small.size, newFiles.size)
          val newBase = latestVersion(spark, path)
          val interlopers = committedVersions(spark, path)
            .filter(v => v > base && v <= newBase)
            .map(v => (v, readCommit(fs, path, v).op))
          // a REPLACE swapped the whole table — the read set is gone by
          // definition (the liveness gate below would also catch it;
          // the explicit check gives the honest diagnostic)
          val replaced = interlopers.filter(_._2 == "replace")
          if (replaced.nonEmpty) throw new CommitConflictException(
            s"lakehouse log at $path: compaction lost the race to " +
              s"whole-table REPLACE commit(s) ${replaced.map(p =>
                s"v${p._1}").mkString(", ")} — re-run against the new head")
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"lakehouse log at $path: compaction lost $maxAttempts " +
              "commit races in a row — giving up", e)
          val newLive = manifestAt(spark, path, newBase)
          // THE gate — file-set conflict detection: compaction removes
          // only files it read and adds files nobody else references,
          // so it commutes with ANY interleaved commit (append, delete,
          // upsert, another compact) that left its read set fully live;
          // an interloper that rewrote or dropped a file this compaction
          // read fails here
          val liveFiles = newLive.select(col("file")).collect()
            .map(r => pathKey(r.getString(0))).toSet
          val missing = small.filterNot(f => liveFiles(pathKey(f)))
          if (missing.nonEmpty) throw new CommitConflictException(
            s"lakehouse log at $path: compaction's read set lost " +
              s"${missing.size} file(s) (e.g. ${missing.head}) from the " +
              s"live manifest — concurrent commit(s) ${interlopers.map(p =>
                s"v${p._1}:${p._2}").mkString(", ")} rewrote or dropped " +
              "files this compaction read; re-run against the new head")
          base = newBase
          m = newLive
      }
    }
    (-1, -1) // unreachable
  }

  /** Test seam: invoked after the compacted files are written, before
    * the first commit attempt — lets a spec interleave a concurrent
    * commit deterministically into [[compact]]'s race window. */
  private[graft] var onCompactBeforeCommit: () => Unit = () => ()

  /**
   * Atomic REPLACE (the INSERT OVERWRITE / CREATE OR REPLACE TABLE
   * shape): swaps the table's ENTIRE contents for `df` in one commit.
   * The new batch lands as fresh UUID-named files first, then the commit
   * publishes a manifest referencing ONLY those files — so a reader
   * pinned on the previous version (or one that resolved "latest" a
   * moment before) keeps reading its complete old snapshot, unlike
   * [[writeClustered]]'s destructive create, which drops the old log
   * before version 0 exists. Superseded files stay on disk for pinned
   * readers until [[vacuum]].
   *
   * A replace may RE-CLUSTER: `zCols` (and the schema) need not match
   * the current layout — the manifest is rebuilt whole, so downstream
   * [[prunedRead]]s simply prune on the new columns. It is a REWRITE op:
   * fail-loud on a commit race (replaying a whole-table swap against a
   * moved base must be the caller's decision), and excluded from the
   * incremental changes feed — a full rewrite cannot be expressed as
   * appended rows. Replacing with an EMPTY frame is refused (use
   * `deleteWhere(lit(true))` to empty a table); parquet needs at least
   * one file to carry the new schema.
   *
   * Like [[appendClustered]], `df` is evaluated up to three times by
   * the z-clustered write (bounds aggregation + range sampling + the
   * write) — `localCheckpoint()` an expensive upstream pipeline first;
   * whether that trade pays is the caller's call for a whole-table
   * batch (the rewrite ops checkpoint internally because their inputs
   * are bounded by the affected files, a different cost regime).
   */
  def replaceClustered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    val spark = df.sparkSession
    val base = latestVersion(spark, path)
    require(base >= 0,
      s"no committed lakehouse log at $path — writeClustered creates one")
    require(!df.isEmpty,
      "replaceClustered: an empty replace is refused — " +
        "deleteWhere(lit(true)) is the explicit way to empty a table")
    val newFiles = writeBatch(spark, path, df, zCols, files, bits)
    require(newFiles.nonEmpty, "replaceClustered: the write added no files")
    commitVersion(spark, path,
      statsOf(spark.read.parquet(newFiles: _*), zCols),
      "replace", "", -1L, base, dataSchema = Some(df.schema))
  }

  /** Ops that REWRITE existing rows into new files (vs append new data).
    * [[addedFilesSince]] skips them — feeding a rewrite downstream would
    * double-count rows the consumer already saw. `upsert` is NOT here:
    * it splits its write into rewrite files and insert-only files, and
    * the feed surfaces exactly the latter (update-postimages still never
    * feed — the remaining slice of the full-CDF trade this module does
    * not take on). `replace` swaps the whole table: by definition not
    * expressible as appended rows. */
  private val RewriteOps = Set("compact", "delete", "replace")

  /** Test observability hook: the number of candidate data files the
    * last COW probe ([[deleteWhere]]/[[upsertByKey]]) actually scanned —
    * lets a spec pin that `pruneRanges` really shrank the probe below
    * the table's file count. */
  @volatile private[graft] var lastProbeScannedFiles: Int = -1

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
   * An EMPTY table (legal after a delete removed every row) takes the
   * insert-all path: every update row lands, nothing is replaced.
   *
   * PURE INSERTS (update keys absent from the table) are written as
   * their own file batch and recorded in the commit marker, so
   * [[changesSince]] feeds exactly them downstream — update-postimages
   * still never feed (they would double-count keys the consumer saw).
   *
   * With a non-empty `streamId`, the commit is txn-FENCED exactly like
   * [[appendClustered]]'s: a re-delivered `batchId` throws instead of
   * double-merging ([[graft.streaming.LakehouseIngest.startMerge]] is
   * the skip-not-throw streaming caller).
   *
   * `updates` is materialized ONCE at entry (`localCheckpoint`): the
   * frame is otherwise evaluated by the probe, the rewrite union, and
   * the final count, and a NON-DETERMINISTIC source (sampling, `rand()`,
   * a re-read of mutating storage) could present different keys to the
   * probe than to the rewrite — silently losing or duplicating rows,
   * the hazard Delta's MERGE materializes its source against.
   *
   * `pruneRanges` (optional) pre-prunes the PROBE scan through the
   * manifest, the same file skipping [[prunedRead]] does — correctness
   * contract: every EXISTING row whose key appears in `updates` must lie
   * inside the ranges (rows outside are never probed, so a matched key
   * out there would duplicate instead of replace). Use it when the
   * update keys bound a clustered column (the CDC shape: today's
   * partition only).
   *
   * Scale shape: the update batch is assumed SMALL against the table
   * (the CDC-merge shape) — its distinct keys broadcast into both the
   * affected-file probe and the survivor anti-join, so the table is
   * never shuffled; the probe scan reads only `keyCols` + file names
   * (column-pruned) over only the manifest-surviving files, and the
   * rewrite reads only the affected files. The contract is ENFORCED,
   * not just documented: a batch carrying more than `maxProbeKeys`
   * distinct keys fails loudly up front — the broadcast probe and the
   * driver-side matched-key collection are both sized by the batch's
   * distinct keys, and an over-contract batch would otherwise blow up
   * the driver mid-merge instead of at the contract boundary. Split
   * such a batch, raise the cap deliberately (sized to driver memory),
   * or pass `largeBatch = true` for the shuffle-side path below.
   *
   * `largeBatch = true` is the over-contract escape hatch: the SAME
   * merge semantics with NO driver-size dependence anywhere — the
   * probe semi-joins the table's key columns against the update keys
   * as a shuffle join (AQE still broadcasts when the batch turns out
   * small), matched keys stay a distributed frame (one extra
   * key-column-pruned scan of the affected files, checkpointed, never
   * collected), and the survivor anti-join shuffles instead of
   * broadcasting. Driver state remains #files-bounded (the per-file
   * match counts). Costs: that extra pruned scan plus shuffles sized
   * by the batch — which is why it is opt-in, not the default: the CDC
   * small-batch shape should keep its zero-shuffle broadcast plan. A
   * WHOLE-table rewrite is still better served by [[replaceClustered]].
   * `maxProbeKeys` does not apply in this mode (nothing driver-sized is
   * bounded by it) — a non-default cap combined with `largeBatch` logs
   * a warning so the dead parameter is visible.
   *
   * CONCURRENCY — file-set conflict detection (the Delta model): a
   * lost commit race is rebased when (a) every file this merge read is
   * still live in the new manifest (an interloper rewriting one stays
   * fail-loud) and (b) the interlopers' ADDED files' manifest stats
   * prove no added row can carry an update key — every key column must
   * be a clustered stats column whose added [min, max] is disjoint
   * from the batch's key bounds on at least one column (the same
   * stats-disjointness argument Delta uses). Appends, deletes, merges,
   * and compactions on OTHER key ranges all rebase; overlapping or
   * stats-less cases and whole-table replaces stay fail-loud
   * [[CommitConflictException]]; `maxAttempts` bounds the retries.
   * Every intermediate frame this merge `localCheckpoint`s (the batch,
   * the large-batch matched keys and splits, the survivors) is
   * RELEASED on exit — success or failure — so a streaming MERGE
   * ingest does not accumulate dead executor blocks micro-batch over
   * micro-batch.
   */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], files: Int = 4, bits: Int = 16,
      pruneRanges: Seq[(String, Double, Double)] = Nil,
      streamId: String = "", batchId: Long = -1L,
      maxProbeKeys: Long = DefaultMaxProbeKeys,
      largeBatch: Boolean = false, maxAttempts: Int = 10): (Int, Long, Long) = {
    require(keyCols.nonEmpty, "upsertByKey: need at least one key column")
    if (largeBatch && maxProbeKeys != DefaultMaxProbeKeys)
      log.warn(s"upsertByKey: maxProbeKeys=$maxProbeKeys is IGNORED with " +
        "largeBatch=true — the shuffle-side path has no driver-sized " +
        "state for the cap to bound")
    // the txn fence, same contract as appendClustered's: a re-delivered
    // batchId throws; skip-not-throw callers (LakehouseIngest) check
    // lastCommittedBatch first. Re-runs on every rebase retry — a
    // concurrent commit may have advanced the stream's high-water mark.
    def fence(): Unit =
      if (streamId.nonEmpty &&
          batchId <= lastCommittedBatch(spark, path, streamId))
        throw new IllegalStateException(
          s"upsertByKey: batch $batchId of stream '$streamId' is already " +
            s"committed at $path — a re-delivered batch must be skipped, " +
            "not re-merged")
    fence()
    val toRelease = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val u = updates.localCheckpoint()
    toRelease += u
    try {
    if (u.isEmpty) return (0, 0L, 0L)
    val base = latestVersion(spark, path)
    require(base >= 0, s"no committed lakehouse log at $path")
    val m = manifestAt(spark, path, base)
    val zCols = m.columns.collect {
      case c if c.startsWith("min_") => c.stripPrefix("min_")
    }.toSeq
    // the rebase's disjointness proof: a file added by a concurrent
    // commit (an append batch, another upsert's postimages/inserts, a
    // delete's survivor re-files) can carry an update key only if its
    // stats overlap the batch's key bounds on EVERY key column that has
    // manifest stats; null file stats (an all-null key column — SQL
    // equality never matches a null key) and null batch bounds both
    // fall out of the overlap naturally
    def keyAddedOverlap(added: DataFrame): Option[String] = {
      val keyStatCols = keyCols.filter(c => m.columns.contains(s"min_$c"))
      if (keyStatCols.isEmpty)
        return Some(s"no key column (${keyCols.mkString(", ")}) carries " +
          "manifest stats, so nothing bounds the added rows' keys — " +
          "cluster on a key column (zCols) to enable the rebase")
      val aggs = keyStatCols.flatMap(c =>
        Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c")))
      val bounds = u.agg(aggs.head, aggs.tail: _*).head()
      val overlap = keyStatCols.zipWithIndex.map { case (c, i) =>
        col(s"max_$c") >= lit(bounds.get(2 * i)) &&
          col(s"min_$c") <= lit(bounds.get(2 * i + 1))
      }.reduce(_ && _)
      val hit = added.filter(overlap).select(col("file")).limit(1).collect()
      if (hit.isEmpty) None
      else Some(s"added file ${hit(0).getString(0)}'s key-column " +
        "stats overlap the update batch's key bounds")
    }
    val fileRows = m.select(col("file"), col("n_rows")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allFiles = fileRows.keys.toSeq
    if (allFiles.isEmpty) {
      // empty table: nothing to probe or replace — insert-all, and every
      // written file feeds the changes feed; the batch defines the
      // schema. Still rebase-guarded: an append interleaving the commit
      // could introduce rows carrying batch keys, which this insert-all
      // decision assumed absent
      lastProbeScannedFiles = 0
      val newFiles = writeBatch(spark, path, u, zCols, files, bits)
      commitRewrite(spark, path, "upsert", streamId, batchId, base, m,
        affected = Nil,
        newStats = Some(statsOf(spark.read.parquet(newFiles: _*), zCols)),
        insertFiles = newFiles, postimageFiles = Nil, deleteFiles = Nil,
        fence = () => fence(), addedOverlap = keyAddedOverlap,
        maxAttempts = maxAttempts,
        commitSchema = Some(u.schema)) // the batch DEFINES the schema here
      return (0, 0L, u.count())
    }
    val data = readData(spark, path, base, allFiles)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
    require(shape(data.schema) == shape(u.schema),
      s"upsertByKey: updates schema ${u.schema.simpleString} does " +
        s"not match the layout's ${data.schema.simpleString}")
    val candidates =
      if (pruneRanges.isEmpty) allFiles
      else selectFilesIn(m, path, pruneRanges)._1
    lastProbeScannedFiles = candidates.size
    val keys = u.select(keyCols.map(col): _*).distinct()
    // split the update batch by whether its key EXISTS in the table:
    // matched rows are UPDATE-POSTIMAGES, unmatched rows are PURE
    // INSERTS — and survivors, postimages, and inserts each land as
    // their own file batch, recorded in the commit marker, so
    // [[changesSince]] feeds exactly the inserts and [[changesDetailed]]
    // feeds inserts + postimages with row-level change types. Null-keyed
    // updates never match (SQL semantics) so they land as inserts.
    // Whether the survivor batch is empty (every affected row replaced)
    // is known from the manifest's n_rows — no extra job. The two modes
    // differ ONLY in where the matched keys live (driver+broadcast vs a
    // checkpointed distributed frame) and whether joins may shuffle.
    val (probe, matchedKeys) = if (!largeBatch) {
      // the small-batch contract, enforced: this path broadcasts `keys`
      // and collects matched key tuples driver-side — probed here with a
      // limit(cap + 1) count over the already-materialized checkpoint
      // (the guard's work is O(cap) regardless of batch size, never a
      // full-batch aggregation) so an over-contract batch fails AT the
      // boundary, loudly, instead of as a driver OOM mid-rewrite
      val capProbe = math.min(maxProbeKeys, Int.MaxValue - 1L).toInt
      require(keys.limit(capProbe + 1).count() <= maxProbeKeys,
        s"upsertByKey: the update batch carries more than " +
          s"maxProbeKeys=$maxProbeKeys distinct keys — the broadcast " +
          "probe and driver-side matched-key collection are sized by the " +
          "batch's distinct keys (the CDC small-batch shape); split the " +
          "batch into smaller merges, raise maxProbeKeys deliberately, " +
          "or pass largeBatch = true for the shuffle-side merge path")
      // ONE probe scan yields both the per-file match counts AND the
      // set of matched key tuples (collect_set is bounded by the update
      // batch's distinct keys per file — small by the CDC contract), so
      // the affected files are not re-read just to learn which keys hit
      val probeRows =
        if (candidates.isEmpty) Array.empty[org.apache.spark.sql.Row]
        else readData(spark, path, base, candidates)
          .select(input_file_name().as("_f") +: keyCols.map(col): _*)
          .join(broadcast(keys), keyCols, "left_semi")
          .groupBy(col("_f")).agg(count(lit(1)).as("n"),
            collect_set(struct(keyCols.map(col): _*)).as("ks"))
          .collect()
      val keySchema = org.apache.spark.sql.types.StructType(
        keyCols.map(c => u.schema(c)))
      (probeRows.map(r => r.getString(0) -> r.getLong(1)).toMap,
        broadcast(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(
              probeRows.toSeq.flatMap(
                _.getSeq[org.apache.spark.sql.Row](2)).distinct).asJava),
          keySchema)))
    } else {
      // the shuffle-side path: per-file match counts from a shuffle
      // semi-join (driver sees #files rows, never keys), matched keys
      // as a DISTRIBUTED frame — one extra key-column-pruned scan of
      // the affected files, checkpointed once (sized by the matched
      // distinct keys) so the upd/ins splits below don't re-run it
      val counts =
        if (candidates.isEmpty) Map.empty[String, Long]
        else readData(spark, path, base, candidates)
          .select(input_file_name().as("_f") +: keyCols.map(col): _*)
          .join(keys, keyCols, "left_semi")
          .groupBy(col("_f")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val aff = allFiles.filter(counts.contains)
      val mk =
        if (aff.isEmpty) keys.limit(0)
        else {
          val c = keys.join(
            readData(spark, path, base, aff).select(keyCols.map(col): _*),
            keyCols, "left_semi").localCheckpoint()
          toRelease += c
          c
        }
      (counts, mk)
    }
    val affected = allFiles.filter(probe.contains)
    val replaced = probe.values.sum
    // no affected files ⇒ matchedKeys is provably empty: the splits are
    // known without running a join job (the all-insert case skips the
    // wasted shuffle/checkpoint). Otherwise, under the CDC contract the
    // splits are broadcast semi/anti joins over the checkpointed batch —
    // cheap to re-evaluate in writeBatch's three passes; the large-batch
    // splits are SHUFFLE joins, so they materialize once instead of
    // shuffling the batch three times each
    val (upd, ins) =
      if (affected.isEmpty) (u.limit(0), u)
      else {
        def split(how: String) = {
          val j = u.join(matchedKeys, keyCols, how)
          if (largeBatch) { val c = j.localCheckpoint(); toRelease += c; c }
          else j
        }
        (split("left_semi"), split("left_anti"))
      }
    val affectedRows = affected.map(fileRows).sum
    // survivors materialize ONCE (localCheckpoint) before the z-write's
    // three input evaluations — the affected files (the merge's most
    // expensive read, bounded by the COW contract) are scanned a single
    // time for the rewrite, matching [[deleteWhere]]'s single-scan pin.
    // The anti-join broadcasts under the CDC contract; the large-batch
    // path lets the planner shuffle it (AQE downgrades to broadcast
    // when the batch turns out small anyway)
    val survivorKeys = if (largeBatch) keys else broadcast(keys)
    val survivorFiles =
      if (affected.isEmpty || replaced == affectedRows) Seq.empty[String]
      else {
        val surv = readData(spark, path, base, affected)
          .join(survivorKeys, keyCols, "left_anti").localCheckpoint()
        toRelease += surv
        writeBatch(spark, path, surv, zCols, files, bits)
      }
    val postimageFiles =
      if (affected.isEmpty) Seq.empty[String]
      else writeBatch(spark, path, upd, zCols, files, bits)
    val insertFiles =
      if (ins.isEmpty) Seq.empty[String]
      else writeBatch(spark, path, ins, zCols, files, bits)
    val newFiles = survivorFiles ++ postimageFiles ++ insertFiles
    require(newFiles.nonEmpty, "upsertByKey: the rewrite added no files")
    commitRewrite(spark, path, "upsert", streamId, batchId, base, m,
      affected = affected,
      newStats = Some(statsOf(spark.read.parquet(newFiles: _*), zCols)),
      insertFiles = insertFiles, postimageFiles = postimageFiles,
      deleteFiles = Nil, fence = () => fence(),
      addedOverlap = keyAddedOverlap, maxAttempts = maxAttempts)
    (affected.size, replaced, u.count())
    } finally toRelease.foreach(releaseCheckpoint)
  }

  /**
   * Copy-on-write DELETE: rows matching `pred` are removed by rewriting
   * ONLY the data files that contain a match — survivors re-cluster into
   * at most `files` new z-ordered files, every untouched file keeps its
   * bytes and manifest row, and the originals stay on disk for pinned
   * readers until [[vacuum]]. Returns (filesRewritten, rowsDeleted);
   * no match is a no-op with no commit.
   *
   * `pred` must be DETERMINISTIC — it is evaluated in the affected-file
   * probe and again in the survivor filter, and a predicate that answers
   * differently between the two (rand(), sampling) would silently lose
   * or resurrect rows; a non-deterministic predicate throws here, the
   * same refusal Delta's DELETE makes.
   *
   * `pruneRanges` (optional) pre-prunes the PROBE scan through the
   * manifest — correctness contract: `pred` must IMPLY the ranges (any
   * row, current or future, that `pred` can match lies inside them;
   * rows outside are never probed, so a match out there survives). Use
   * it when `pred` bounds a clustered column; a spec pins that the
   * probe then scans fewer files than the table holds.
   *
   * CONCURRENCY — file-set conflict detection (the Delta model): a
   * lost commit race is rebased when (a) every file this delete read
   * is still live in the new manifest and (b) the interlopers' ADDED
   * files' manifest stats are disjoint from `pruneRanges` — the ranges
   * bound everything `pred` can match, so a disjoint added file
   * provably contains no doomed row; interloper REMOVALS outside the
   * read set only take rows away and cannot create a match. Appends,
   * merges, deletes, and compactions on OTHER ranges all rebase. A
   * delete WITHOUT `pruneRanges` has no bound to reason with and stays
   * fail-loud on any race, as do overlapping added files, read-set
   * rewrites, and whole-table replaces; `maxAttempts` bounds the
   * retries.
   *
   * SQL DELETE semantics: a row is removed iff `pred` is TRUE — rows
   * where it evaluates null are kept. The affected-file probe is one
   * scan over the candidate file set with `pred` pushed down (a
   * selective predicate on a clustered column touches few row groups);
   * the rewrite reads only the affected files. Clustered columns are
   * recovered from the manifest, so the caller states nothing twice.
   *
   * With `cdf = true` (the default) the DELETED rows are also written to
   * a `_cdf/` sidecar (never part of the data manifest — plain readers
   * cannot see it) and recorded in the commit marker, so
   * [[changesDetailed]] can retract them downstream with
   * `_change_type = delete`. Costs one extra write sized by the deleted
   * rows — NOT an extra read: the affected files are materialized once
   * and both outputs (survivors + sidecar) split from that single scan.
   * Pass `cdf = false` for bulk purges nobody mirrors.
   */
  def deleteWhere(spark: SparkSession, path: String,
      pred: org.apache.spark.sql.Column, files: Int = 4, bits: Int = 16,
      pruneRanges: Seq[(String, Double, Double)] = Nil,
      cdf: Boolean = true, maxAttempts: Int = 10): (Int, Long) = {
    val base = latestVersion(spark, path)
    require(base >= 0, s"no committed lakehouse log at $path")
    val m = manifestAt(spark, path, base)
    val zCols = m.columns.collect {
      case c if c.startsWith("min_") => c.stripPrefix("min_")
    }.toSeq
    val allFiles = m.select(col("file")).collect().map(_.getString(0)).toSeq
    if (allFiles.isEmpty) return (0, 0L)
    val candidates =
      if (pruneRanges.isEmpty) allFiles
      else selectFilesIn(m, path, pruneRanges)._1
    lastProbeScannedFiles = candidates.size
    if (candidates.isEmpty) return (0, 0L)
    val probeFrame = readData(spark, path, base, candidates).filter(pred)
    // the determinism check must run on the ANALYZED plan: an unresolved
    // rand() reports deterministic=true until function resolution binds it
    require(!probeFrame.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if !f.condition.deterministic => f
    }.isDefined,
      "deleteWhere: the predicate is non-deterministic — it is evaluated " +
        "twice (probe + survivor filter) and could answer differently " +
        "each time, silently losing or resurrecting rows")
    val hits = probeFrame
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (hits.isEmpty) return (0, 0L)
    val affected = allFiles.filter(f => hits.contains(f))
    // the affected files — the mutation's most expensive input —
    // materialize ONCE (localCheckpoint, the module's idiom from
    // [[upsertByKey]]): the survivor z-write alone evaluates its input
    // three times (bounds agg + range sampling + write), and with CDF
    // the deleted-row sidecar consumes it too; every pass after this
    // line reads cached blocks, never the files (spec-pinned via a
    // counting filesystem: the whole delete opens the affected files at
    // most twice — probe + this materialization)
    val affFrame = readData(spark, path, base, affected).localCheckpoint()
    try {
    val survivors = affFrame.filter(!(pred <=> lit(true)))
    val anySurvivor = !survivors.isEmpty
    val newFiles =
      if (anySurvivor) writeBatch(spark, path, survivors, zCols, files, bits)
      else Seq.empty[String]
    // the CDF sidecar: the doomed rows, written OUTSIDE data/ so no
    // table reader ever sees them; the marker references the exact
    // files, so a crash before commit leaves only unreferenced debris
    // (vacuum sweeps it)
    val deleteFiles =
      if (!cdf) Seq.empty[String]
      else {
        val fs = fsOf(spark, path)
        val dir = new Path(path,
          s"_cdf/del-${java.util.UUID.randomUUID().toString}")
        affFrame.filter(pred <=> lit(true))
          .write.parquet(dir.toString)
        fs.listStatus(dir).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .map(s => fs.makeQualified(s.getPath).toUri.toString)
      }
    // the rebase's disjointness proof: `pred` implies `pruneRanges` (the
    // documented contract), so a concurrently-added file whose stats are
    // disjoint from the ranges provably holds no row this delete should
    // remove. selectFilesIn IS the overlap test (a file survives pruning
    // iff it overlaps every range); no ranges ⇒ no bound ⇒ not provable.
    def deleteAddedOverlap(added: DataFrame): Option[String] = {
      if (pruneRanges.isEmpty)
        return Some("the delete carries no pruneRanges, so no stats " +
          "bound exists to prove concurrently-added rows cannot match " +
          "the predicate (pass pruneRanges to enable the rebase)")
      val (overlapping, _) = selectFilesIn(added, path, pruneRanges)
      if (overlapping.isEmpty) None
      else Some(s"${overlapping.size} added file(s) (e.g. " +
        s"${overlapping.head}) overlap the delete's pruneRanges")
    }
    commitRewrite(spark, path, "delete", "", -1L, base, m,
      affected = affected,
      newStats =
        if (newFiles.isEmpty) None
        else Some(statsOf(spark.read.parquet(newFiles: _*), zCols)),
      insertFiles = Nil, postimageFiles = Nil, deleteFiles = deleteFiles,
      fence = () => (), addedOverlap = deleteAddedOverlap,
      maxAttempts = maxAttempts)
    (affected.size, hits.values.sum)
    } finally releaseCheckpoint(affFrame)
  }

  /**
   * Reclaims storage the log no longer needs: data files referenced by
   * NONE of the last `retainVersions` committed snapshots (compacted-away
   * originals, crashed-append leftovers, any orphan under `data/`),
   * superseded versions' manifest parquet, crashed staging directories
   * (`_stage-*`, `_log/_tmp-*`), and marker-less pre-protocol version
   * dirs. Commit MARKERS are kept for every version so
   * [[lastCommittedBatch]] fencing survives. Returns
   * (dataFilesDeleted, manifestsPruned).
   *
   * A RETAINED version whose manifest a previous, narrower-windowed
   * vacuum already pruned is SKIPPED, not fatal — its snapshot is
   * unreadable either way, and failing the whole vacuum would wedge
   * maintenance until an unrelated commit moved the window.
   *
   * CONCURRENT-APPEND SAFETY (`orphanGraceMs`): a mid-commit appender
   * has already renamed its data files into `data/` (and may hold
   * staging under `_stage-*` / `_log/_tmp-*`) before any manifest
   * references them — to vacuum they are indistinguishable from crashed
   * debris. Unreferenced files/staging YOUNGER than `orphanGraceMs` are
   * therefore left alone (the same age-cutoff defense Delta's VACUUM
   * retention period provides); size it above the longest plausible
   * append's write-to-commit latency. Files SUPERSEDED by the retained
   * window (compacted-away originals, rewritten COW inputs) are equally
   * age-guarded — they reclaim on the next vacuum after the grace, a
   * deliberate delay, not a leak. Pass 0 only where a concurrent writer
   * is impossible (tests, a strictly single-writer deployment).
   *
   * Contract: snapshots older than the retained window stop being
   * readable — the same retention trade Delta's `VACUUM` makes. Size
   * `retainVersions` to outlive the longest concurrent reader.
   */
  def vacuum(spark: SparkSession, path: String,
      retainVersions: Int = 1,
      orphanGraceMs: Long = 600000L): (Int, Int) = {
    require(retainVersions >= 1,
      s"vacuum: retainVersions must be >= 1, got $retainVersions")
    val fs = fsOf(spark, path)
    val committed = committedVersions(spark, path)
    require(committed.nonEmpty, s"no committed lakehouse log at $path")
    val retained = committed.takeRight(retainVersions)
    // the grace cutoff compares against STORE-side modification times, so
    // "now" must come from the store's clock, not this host's: a storage
    // service running behind the vacuum host would otherwise silently
    // shrink the window protecting a mid-commit appender's just-renamed
    // files. A throwaway probe file's mtime IS the store clock; the MIN
    // of store and local now is used so skew in either direction only
    // ever WIDENS the effective grace (falls back to local time if the
    // probe fails — degraded to the documented pre-probe behavior)
    val storeNow =
      try {
        val probe = new Path(logDir(path),
          s"_clock-probe-${java.util.UUID.randomUUID().toString}")
        fs.create(probe, false).close()
        val t = fs.getFileStatus(probe).getModificationTime
        fs.delete(probe, false)
        t
      } catch { case _: Exception => Long.MaxValue }
    val cutoff =
      math.min(storeNow, System.currentTimeMillis()) - orphanGraceMs
    def oldEnough(p: Path): Boolean =
      try fs.getFileStatus(p).getModificationTime <= cutoff
      catch { case _: java.io.FileNotFoundException => false }
    val live: Set[String] = retained.flatMap { v =>
      if (!fs.exists(new Path(versionDir(path, v), "manifest")))
        Seq.empty // already pruned by an earlier narrower vacuum
      else manifestAt(spark, path, v).select(col("file")).collect()
        .map(r => pathKey(r.getString(0))).toSeq
    }.toSet
    val dead = listData(spark, path).toSeq
      .filterNot(f => live(pathKey(f)))
      .filter(f => oldEnough(new Path(new java.net.URI(f))))
    dead.foreach(f => fs.delete(new Path(new java.net.URI(f)), false))
    val pruned = committed.dropRight(retainVersions).count { v =>
      val mp = new Path(versionDir(path, v), "manifest")
      fs.exists(mp) && fs.delete(mp, true)
    }
    fs.listStatus(new Path(logDir(path))).foreach { st =>
      st.getPath.getName match {
        case VersionDirRe(_) if !fs.exists(new Path(st.getPath, "_commit"))
            && oldEnough(st.getPath) =>
          fs.delete(st.getPath, true)
        case n if n.startsWith("_tmp-") && oldEnough(st.getPath) =>
          fs.delete(st.getPath, true)
        case n if n.startsWith("_clock-probe-") && oldEnough(st.getPath) =>
          fs.delete(st.getPath, false) // a crashed vacuum's clock probe
        case _ => ()
      }
    }
    val root = new Path(path)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      if (st.getPath.getName.startsWith("_stage-") && oldEnough(st.getPath))
        fs.delete(st.getPath, true)
    }
    // CDF sidecar retention: delete-row files referenced only by
    // versions OUTSIDE the retained window (their feed window has
    // passed — same trade as the manifests), plus crashed-delete debris
    // referenced by no marker at all
    val cdfDir = new Path(path, "_cdf")
    if (fs.exists(cdfDir)) {
      val liveCdf = retained.flatMap(v =>
        readCommit(fs, path, v).deleteFiles.map(pathKey)).toSet
      fs.listStatus(cdfDir).foreach { st =>
        val fls =
          if (st.isFile) Seq(st)
          else fs.listStatus(st.getPath).toSeq
        fls.filter(f => f.isFile &&
            !liveCdf(pathKey(f.getPath.toUri.toString)) &&
            f.getModificationTime <= cutoff)
          .foreach(f => fs.delete(f.getPath, false))
        if (st.isDirectory && fs.listStatus(st.getPath).isEmpty)
          fs.delete(st.getPath, true)
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
    prunedFrom(spark, path, version,
      selectFilesMultiAt(spark, path, version, Seq((predCol, lo, hi)))._1,
      Seq((predCol, lo, hi)))

  /** [[prunedRead]] over a conjunction of ranges — manifest pruning on
    * every clustered column at once, then the exact residual AND.
    * "Latest" is resolved ONCE: file list and schema both come from that
    * version, so a commit landing mid-plan cannot mix a newer manifest
    * with an older schema (or vice versa). */
  def prunedReadMulti(spark: SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    val v = latestVersion(spark, path)
    prunedFrom(spark, path, v,
      selectFilesMultiAt(spark, path, v, ranges)._1, ranges)
  }

  private def prunedFrom(spark: SparkSession, path: String, version: Long,
      files: Seq[String],
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    if (files.isEmpty)
      return readData(spark, path, version, Nil)
    val scan = readData(spark, path, version, files)
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
    * table. REWRITE versions (`compact`, `delete`, `replace`) are
    * EXCLUDED: they re-file rows the consumer already saw, and
    * double-counting them is exactly the bug this op-aware diff prevents
    * (the reason commits record their op at all). `upsert` versions feed
    * ONLY their marker-recorded insert-only files — [[upsertByKey]]
    * writes pure inserts (keys absent from the table) as their own batch
    * precisely so the feed can surface them without re-feeding the
    * rewritten survivors. So this is an APPEND feed; deletions and
    * update-postimages are not fed downstream, the Delta CDF trade this
    * module does not take on. Driver-sized: #versions manifest replays.
    * Versions whose manifests were vacuumed away fail loudly — consume
    * before the retention window passes. */
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
        if (info.op == "upsert") {
          // marker paths are writer-qualified URIs, manifest paths are
          // input_file_name() form — match on the path component
          val insKeys = info.insertFiles.map(pathKey).toSet
          (cur -- prev).filter(f => insKeys(pathKey(f))).toSeq.sorted
        } else if (RewriteOps.contains(info.op)) Seq.empty
        else (cur -- prev).toSeq.sorted
      (acc :+ (v, added), Some(cur))
    }._1.filter(_._2.nonEmpty)
  }

  /** The rows added since `sinceVersion` — reads ONLY the files
    * [[addedFilesSince]] surfaces (create + append commits, plus upsert
    * commits' insert-only batches; compaction/delete/replace rewrites
    * excluded), so a nightly downstream pass costs the new bytes, never
    * a table rescan. Empty frame (with the table's schema) when nothing
    * new landed. */
  def changesSince(spark: SparkSession, path: String,
      sinceVersion: Long): DataFrame = {
    // resolve "latest" once and clamp the feed to it: files appended
    // before a column was added null-fill it under the resolved schema,
    // and a commit landing mid-plan cannot slip newer files under an
    // older schema
    val v = latestVersion(spark, path)
    readData(spark, path, v,
      addedFilesSince(spark, path, sinceVersion)
        .filter(_._1 <= v).flatMap(_._2))
  }

  /**
   * The ROW-LEVEL change data feed (Delta CDF analog): every change in
   * `(sinceVersion, latest]` as data rows plus `_change_type`
   * (`insert` | `update_postimage` | `delete`) and `_version` —
   * everything a downstream MIRROR needs to stay key-exact:
   *
   *  - create/append commits feed their new files as `insert`;
   *  - upsert commits feed their marker-recorded insert-only batch as
   *    `insert` and their update-postimage batch as `update_postimage`
   *    (survivor re-files never feed — the consumer already has those
   *    rows);
   *  - delete commits feed the deleted rows from the `_cdf/` sidecar
   *    [[deleteWhere]] wrote (rows deleted with `cdf = false` are NOT
   *    retractable — same trade as Delta with CDF disabled);
   *  - compaction feeds nothing (pure re-file);
   *  - a `replace` in range FAILS LOUDLY: a whole-table swap cannot be
   *    expressed as row changes — the consumer must re-sync from the
   *    new snapshot.
   *
   * Invariant (spec-pinned): applying the feed in `_version` order to
   * the `sinceVersion` snapshot — delete by key, then upsert
   * postimages + inserts by key — reproduces the latest snapshot
   * exactly. All rows resolve under the LATEST schema (pre-evolution
   * rows null-fill added columns). Upsert commits written before
   * postimage tracking feed only their inserts (their postimages were
   * never split out); start mirrors from a fresh snapshot on such logs.
   *
   * Scale shape: one scan node per contributing (version, change-type)
   * group, unioned — sized by the CONSUMPTION WINDOW (a nightly
   * consumer unions a day of commits), not the table; a consumer that
   * lets thousands of versions pile up should catch up in windowed
   * calls. Wall time is the new bytes (12M-row soak: 1.4s).
   *
   * == The mirror recipe (spec-pinned end-to-end) ==
   *
   * A downstream mirror consumes the feed in windows, each window
   * applied in `_version` order, recording the high-water mark it has
   * applied through:
   *
   * {{{
   *   var applied = mirrorState.lastAppliedVersion  // durable
   *   val head = Lakehouse.latestVersion(spark, path)
   *   Lakehouse.consumeChanges(spark, path, applied) { feed =>
   *     mirror = Lakehouse.applyChangeFeed(mirror, feed, keyCols)
   *   }                                             // translates a
   *   applied = head                                // vacuumed feed into
   *                                                 // the retention error
   * }}}
   *
   * If [[consumeChanges]] throws the retention-contract error — the
   * mirror fell behind a [[vacuum]] window, or a REPLACE landed — the
   * recovery is a RE-SYNC: drop the mirror, read the latest snapshot
   * whole (`readData` of the live manifest / [[prunedReadMulti]]), and
   * resume the feed from that version. Never skip the failed window and
   * continue — the mirror would silently diverge.
   *
   * A KEY-UNIQUE mirror catching up over many versions should apply
   * each window with [[applyChangeFeedCollapsed]] instead — one merge
   * of the window's final state per key, constant plan depth — falling
   * back to [[applyChangeFeed]] automatically where the collapse's
   * guard cannot hold.
   */
  def changesDetailed(spark: SparkSession, path: String,
      sinceVersion: Long): DataFrame = {
    val fs = fsOf(spark, path)
    val latest = latestVersion(spark, path)
    val versions = committedVersions(spark, path)
      .filter(v => v > sinceVersion && v <= latest)
    def filesOf(v: Long): Set[String] = {
      require(fs.exists(new Path(versionDir(path, v), "manifest")),
        s"changesDetailed: version $v's manifest was vacuumed — " +
          "incremental consumers must keep up with the retention window")
      manifestAt(spark, path, v).select(col("file")).collect()
        .map(_.getString(0)).toSet
    }
    // fold with a CARRIED previous-file-set (addedFilesSince's trick):
    // consecutive appends replay one manifest each instead of two; a
    // rewrite/typed op invalidates the carry (its file set moved), so
    // the next append falls back to filesOf(v - 1)
    val groups: Seq[(Seq[String], String, Long)] = versions.foldLeft(
        (Seq.empty[(Seq[String], String, Long)],
          Option.empty[Set[String]])) { case ((acc, prevOpt), v) =>
      val info = readCommit(fs, path, v)
      info.op match {
        case "replace" => throw new IllegalStateException(
          s"changesDetailed: version $v of $path is a whole-table " +
            "REPLACE — not expressible as row changes; re-sync the " +
            "consumer from the new snapshot")
        case "compact" => (acc, None)
        case "delete" =>
          (if (info.deleteFiles.isEmpty) acc
           else acc :+ ((info.deleteFiles, "delete", v)), None)
        case "upsert" =>
          (acc ++ Seq((info.insertFiles, "insert", v),
            (info.postimageFiles, "update_postimage", v))
            .filter(_._1.nonEmpty), None)
        case _ => // create / append: the manifest diff, as changesSince
          val cur = filesOf(v)
          val prev = prevOpt.getOrElse(
            if (v == 0) Set.empty[String] else filesOf(v - 1))
          val added = (cur -- prev).toSeq.sorted
          (if (added.isEmpty) acc
           else acc :+ ((added, "insert", v)), Some(cur))
      }
    }._1
    // fail with the retention contract, not a mid-job FileNotFound: a
    // feed file vacuumed away means the consumer fell behind the window
    groups.foreach { case (fls, ct, v) =>
      fls.find(f => !fs.exists(new Path(new java.net.URI(f)))).foreach(f =>
        throw new IllegalStateException(
          s"changesDetailed: version $v's $ct file $f was vacuumed — " +
            "incremental consumers must keep up with the retention window"))
    }
    val empty = readData(spark, path, latest, Nil)
      .withColumn("_change_type", lit(""))
      .withColumn("_version", lit(0L)).limit(0)
    groups.foldLeft(empty) { case (acc, (fls, ct, v)) =>
      acc.unionByName(readData(spark, path, latest, fls)
        .withColumn("_change_type", lit(ct))
        .withColumn("_version", lit(v)))
    }
  }

  /** Runs `use` over one [[changesDetailed]] window, translating a
    * mid-job `FileNotFoundException` (anywhere in the failure's cause
    * chain) into the retention-contract error. The pre-existence sweep
    * inside [[changesDetailed]] covers the common case, but it is
    * check-then-read: a [[vacuum]] deleting a feed file BETWEEN the
    * sweep and the scan would otherwise surface as a raw task failure —
    * this wrapper guarantees the diagnostic (and therefore the mirror
    * recipe's re-sync trigger) under concurrent maintenance. */
  def consumeChanges[T](spark: SparkSession, path: String,
      sinceVersion: Long)(use: DataFrame => T): T = {
    def fnf(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[java.io.FileNotFoundException] ||
        t.getClass.getSimpleName.contains("FileNotFound") ||
        fnf(t.getCause))
    try use(changesDetailed(spark, path, sinceVersion))
    catch {
      case e: Throwable if fnf(e) =>
        throw new IllegalStateException(
          s"consumeChanges: a feed file of $path vanished mid-read " +
            "(vacuumed concurrently) — incremental consumers must keep " +
            "up with the retention window; re-sync the mirror from the " +
            "latest snapshot", e)
    }
  }

  /** Applies a [[changesDetailed]] feed to a mirror `snapshot`, version
    * by version in `_version` order — the reference implementation of
    * the mirror recipe, spec-pinned to reproduce the source's latest
    * snapshot exactly:
    *
    *  - `delete` rows retract by WHOLE ROW with multiplicity
    *    (`exceptAll`) — exact for keyed and unkeyed tables alike, since
    *    the sidecar carries the full deleted rows;
    *  - `update_postimage` rows replace by `keyCols` (drop every mirror
    *    row carrying a postimage key, then add the postimages) — the
    *    keyed-merge semantics [[upsertByKey]] wrote them under;
    *  - `insert` rows append as-is (append-commit inserts are arbitrary
    *    rows; upsert-commit inserts carry keys absent from the table by
    *    construction, so plain union is exact for both).
    *
    * Driver-side work is one distinct pass over the window's (version,
    * change-type) pairs — consumption-window sized, like the feed
    * itself; the plan depth grows with the window's version count, so a
    * consumer catching up over MANY versions should checkpoint the
    * mirror between windowed calls. */
  def applyChangeFeed(snapshot: DataFrame, feed: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(feed.columns.contains("_change_type") &&
      feed.columns.contains("_version"),
      "applyChangeFeed: feed must come from changesDetailed " +
        "(_change_type/_version columns missing)")
    val dataCols = feed.columns.filterNot(c =>
      c == "_change_type" || c == "_version").map(col).toSeq
    // window-sized driver pass: which change types each version carries
    val present = feed.select(col("_version"), col("_change_type"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byVersion = present.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byVersion.keys.toSeq.sorted.foldLeft(snapshot) { case (acc, v) =>
      val kinds = byVersion(v)
      val at = feed.filter(col("_version") === v)
      var next = acc
      if (kinds("delete"))
        next = next.exceptAll(
          at.filter(col("_change_type") === "delete").select(dataCols: _*))
      if (kinds("update_postimage")) {
        val post = at.filter(col("_change_type") === "update_postimage")
        next = next.join(
            broadcast(post.select(keyCols.map(col): _*).distinct()),
            keyCols, "left_anti")
          .unionByName(post.select(dataCols: _*))
      }
      if (kinds("insert"))
        next = next.unionByName(
          at.filter(col("_change_type") === "insert").select(dataCols: _*))
      next
    }
  }

  /**
   * [[applyChangeFeed]] with CONSTANT plan depth for the KEY-UNIQUE
   * case: the feed window folds to its final state per key (the change
   * with the highest `_version` wins) and applies as ONE merge — drop
   * every mirror row carrying a touched key, then add the final
   * non-delete rows — instead of 3 ops × #versions. A consumer catching
   * up over hundreds of versions gets an O(1)-deep plan (spec-pinned)
   * where the per-version replay would build a hundreds-deep
   * except/anti/union chain before its first checkpoint.
   *
   * GUARD — the collapse is exact only when `keyCols` is a UNIQUE key
   * of the table (every key holds at most one live row, the
   * [[upsertByKey]]-maintained shape), because it retracts deletes BY
   * KEY where the general path retracts by whole row with multiplicity.
   * The feed-observable part of that contract is checked here — any
   * null-keyed change row, or a key changed twice within one version
   * (a multi-row-per-key upsert batch), falls back to the per-version
   * replay automatically (one window-sized guard job). The
   * table-uniqueness half is the caller's declaration, same as handing
   * `keyCols` to [[upsertByKey]].
   *
   * A key touched in several versions folds correctly by construction:
   * version order is total, so the max-version change IS the final
   * state (insert-then-delete retracts, delete-then-reinsert lands the
   * reinsert, postimage chains land the last postimage).
   */
  def applyChangeFeedCollapsed(snapshot: DataFrame, feed: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(feed.columns.contains("_change_type") &&
      feed.columns.contains("_version"),
      "applyChangeFeedCollapsed: feed must come from changesDetailed " +
        "(_change_type/_version columns missing)")
    require(keyCols.nonEmpty, "applyChangeFeedCollapsed: need key columns")
    val dataCols = feed.columns.filterNot(c =>
      c == "_change_type" || c == "_version").map(col).toSeq
    // the feed-side guard, one window-sized job: null keys cannot merge
    // by key (SQL equality), and two changes to one key inside one
    // version have an intra-version order the fold cannot see
    val unsafe = feed
      .groupBy((keyCols.map(col) :+ col("_version")): _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1 ||
        keyCols.map(col(_).isNull).reduce(_ || _))
      .limit(1).count() > 0
    if (unsafe) return applyChangeFeed(snapshot, feed, keyCols)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_version").desc)
    val last = feed.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // one anti-join + one union, whatever the window's version count;
    // the touched-key frame is window-sized — no broadcast hint, AQE
    // broadcasts small windows and shuffles a month-long catch-up
    snapshot.join(last.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(
        last.filter(col("_change_type") =!= "delete").select(dataCols: _*))
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
      ranges: Seq[(String, String, String)]): DataFrame = {
    // resolve "latest" once — same snapshot-consistency note as
    // [[prunedReadMulti]]
    val v = latestVersion(spark, path)
    prunedTypedFrom(spark, path, v,
      selectFilesTypedAt(spark, path, v, ranges)._1, ranges)
  }

  /** [[prunedReadTyped]] against a PINNED version — typed time travel,
    * same retention contract as [[prunedReadAt]]. */
  def prunedReadTypedAt(spark: SparkSession, path: String, version: Long,
      ranges: Seq[(String, String, String)]): DataFrame =
    prunedTypedFrom(spark, path, version,
      selectFilesTypedAt(spark, path, version, ranges)._1, ranges)

  private def prunedTypedFrom(spark: SparkSession, path: String,
      version: Long, files: Seq[String],
      ranges: Seq[(String, String, String)]): DataFrame = {
    if (files.isEmpty)
      return readData(spark, path, version, Nil)
    val scan = readData(spark, path, version, files)
    val lits = typedBounds(spark, ranges, c => scan.schema(c).dataType)
    val exact = ranges.zip(lits).map { case ((c, _, _), (loL, hiL)) =>
      col(c) >= loL && col(c) <= hiL
    }.reduce(_ && _)
    scan.filter(exact)
  }
}
