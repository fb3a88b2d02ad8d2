package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Lakehouse

/**
 * Micro-batch ingest into a [[graft.operators.Lakehouse]] layout: each
 * micro-batch lands as its own z-clustered batch of files plus a new
 * manifest snapshot ([[Lakehouse.appendClustered]]; the first batch
 * creates the layout). This is the continuously-maintained form of the
 * nightly append — readers run [[Lakehouse.prunedRead]] against a layout
 * that grows file-granularly while the stream runs, and periodic
 * [[Lakehouse.compact]] + [[Lakehouse.vacuum]] fold the micro-batch
 * debris (small files are the KNOWN cost of streaming into a clustered
 * layout; compaction is the maintenance pass, exactly as in
 * Delta/Iceberg deployments).
 *
 * Delivery contract: EXACTLY-ONCE under DETERMINISTIC REPLAY — the same
 * scope as Delta's `txn` fence. `foreachBatch` re-runs a batch after a
 * crash between the sink write and the checkpoint commit; every
 * lakehouse commit records `(streamId, batchId)` (the Delta `txn`
 * analog), so [[processBatch]] fences the re-delivery — a batchId at or
 * below [[Lakehouse.lastCommittedBatch]] is a no-op. The fence lives in
 * the table's own log, not the stream's checkpoint, so it also covers a
 * checkpoint wipe PROVIDED the source re-delivers the same batch
 * boundaries (AvailableNow over an unchanged source, as the spec pins).
 * If the checkpoint is lost AND the source has since gained data (or
 * batches split differently — Kafka, a file source with new files), a
 * replayed batchId at or below the high-water mark is fenced WHOLESALE,
 * dropping any NEW rows mixed into it: restart such a stream under a
 * FRESH `streamId` (at-least-once, dedup downstream) instead of relying
 * on the fence. `streamId` defaults to the checkpoint path; pass an
 * explicit stable id when the checkpoint may move between deployments.
 */
object LakehouseIngest {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** In-line maintenance policy: after every `every`-th COMMITTED batch,
    * data files under `minRows` rows are re-clustered into `files` files
    * ([[Lakehouse.compact]]) and superseded bytes reclaimed under
    * `retainVersions` ([[Lakehouse.vacuum]]) — the full production loop
    * (ingest + OPTIMIZE + retention) in one stream, safe because
    * foreachBatch serializes everything through the single writer.
    * Fenced (re-delivered) batches never trigger maintenance: no new
    * debris, and a replay must stay a strict no-op. `retainVersions`
    * must outlive the slowest concurrent reader's snapshot — 1 is right
    * when readers always resolve "latest" fresh. */
  case class Maintenance(every: Int, minRows: Long, files: Int = 4,
      retainVersions: Int = 1, orphanGraceMs: Long = 600000L,
      maxConsecutiveSkips: Int = 5) {
    require(every >= 1, s"Maintenance.every must be >= 1, got $every")
    require(maxConsecutiveSkips >= 1,
      s"Maintenance.maxConsecutiveSkips must be >= 1, got $maxConsecutiveSkips")
  }

  /** The per-batch commit step, exposed so the crash-replay spec can
    * re-deliver a batchId deterministically. Batch 0 on an empty path
    * creates the layout (a crash mid-create left no committed version,
    * so the retried create overwrites cleanly); a batchId already in the
    * log is skipped — the exactly-once fence. */
  def processBatch(batch: DataFrame, batchId: Long, path: String,
      zCols: Seq[String], filesPerBatch: Int, streamId: String,
      maintenance: Option[Maintenance] = None): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (Lakehouse.latestVersion(spark, path) < 0)
      Lakehouse.writeClustered(batch, path, zCols, filesPerBatch,
        streamId = streamId, batchId = batchId)
    else if (batchId > Lakehouse.lastCommittedBatch(spark, path, streamId))
      Lakehouse.appendClustered(batch, path, zCols, filesPerBatch,
        streamId = streamId, batchId = batchId)
    else {
      // fenced — this batch's commit already landed; the re-delivery
      // (crash between sink commit and checkpoint commit) is a no-op.
      // Logged because a LONG fenced run (vs the expected one batch
      // after a restart) means the checkpoint regressed further than
      // the operator thinks
      log.warn(s"lakehouse ingest: batch $batchId of stream '$streamId' " +
        s"already committed at $path — fenced, skipping (exactly-once)")
      return // a replay is a strict no-op: no maintenance either
    }
    maintenance.foreach(m => runMaintenance(spark, path, zCols, batchId, m))
  }

  /** Consecutive maintenance skips per table path, for the escalation
    * guard below — process-local state, which is exactly the scope
    * foreachBatch maintenance runs in. */
  private val skippedCycles =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** The in-stream maintenance pass. [[Lakehouse.compact]] resolves a
    * lost race internally with file-set conflict detection (any
    * interloper that left its read set live — appends, other-range
    * deletes/merges — rebases), so a
    * [[Lakehouse.CommitConflictException]] reaching here means a writer
    * REWROTE files this compaction read, a whole-table replace, or an
    * exhausted retry budget — still a legitimate race, so the cycle
    * SKIPS (warn, retry at the next `every`-th batch) instead of
    * killing the stream. But only
    * `maxConsecutiveSkips` times in a row: a genuinely persistent
    * conflict (a stuck rewriter, a misconfiguration making every commit
    * fail as a "race") must surface as the failure it is, not be
    * downgraded to an endless skip-warn loop while compaction and
    * vacuum silently never run. Non-conflict failures (a real
    * filesystem error — [[Lakehouse.commitVersion]] no longer
    * reclassifies those as conflicts) propagate immediately. */
  private[graft] def runMaintenance(
      spark: org.apache.spark.sql.SparkSession,
      path: String, zCols: Seq[String], batchId: Long,
      m: Maintenance): Unit = {
    if (batchId > 0 && batchId % m.every == 0) {
      try {
        val (c, w) = Lakehouse.compact(spark, path, zCols, m.minRows, m.files)
        if (c > 0) {
          val (freed, _) =
            Lakehouse.vacuum(spark, path, m.retainVersions, m.orphanGraceMs)
          log.info(s"lakehouse ingest maintenance at batch $batchId: " +
            s"compacted $c files -> $w, vacuum reclaimed $freed")
        }
        skippedCycles.remove(path)
      } catch {
        // budget exhaustion surfaces as IllegalStateException CAUSED BY
        // the last CommitConflictException ("lost N commit races in a
        // row") — still a legitimate race outcome, so it takes the same
        // skip path; an IllegalStateException with any other cause is a
        // real failure and propagates
        case e @ (_: Lakehouse.CommitConflictException |
                  _: IllegalStateException)
            if e.isInstanceOf[Lakehouse.CommitConflictException] ||
              e.getCause.isInstanceOf[Lakehouse.CommitConflictException] =>
          val n: Int = skippedCycles.merge(path, 1, (a, b) => a + b)
          if (n >= m.maxConsecutiveSkips) {
            skippedCycles.remove(path)
            throw new IllegalStateException(
              s"lakehouse ingest maintenance at $path lost $n consecutive " +
                "commit races — this is no longer plausibly contention; " +
                "find the conflicting writer (or the failure masquerading " +
                "as one) before restarting the stream", e)
          }
          log.warn(s"lakehouse ingest maintenance at batch $batchId lost " +
            s"a commit race to a concurrent writer — skipping this cycle " +
            s"($n/${m.maxConsecutiveSkips} consecutive): " + e.getMessage)
      }
    }
  }

  /** Starts the ingest; caller awaits termination. `filesPerBatch` sizes
    * each micro-batch's z-range split — keep it small (micro-batches are
    * small) and let [[Lakehouse.compact]] consolidate. */
  def start(stream: DataFrame, path: String, zCols: Seq[String],
      filesPerBatch: Int, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      streamId: String = "",
      maintenance: Option[Maintenance] = None): StreamingQuery = {
    val sid = if (streamId.nonEmpty) streamId else checkpoint
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, path, zCols, filesPerBatch, sid,
          maintenance)
      }
      .start()
  }

  /** The per-batch MERGE step — [[Lakehouse.upsertByKey]] under the same
    * `(streamId, batchId)` fence as [[processBatch]]: the CDC-ingest
    * idiom (an upsert stream MERGEd in `foreachBatch`, Delta's
    * `forEachBatch` + `MERGE INTO` shape) with exactly-once under
    * deterministic replay. Batch 0 on an empty path creates the layout;
    * each later micro-batch replaces matched keys wholesale and inserts
    * new ones (whose rows reach [[Lakehouse.changesSince]] consumers).
    *
    * `versionCol` (optional) reduces the batch to latest-wins per key
    * FIRST ([[graft.operators.Cdc.latestByKey]]): a CDC micro-batch can
    * carry several updates for one key, and upsert semantics would land
    * them all. Leave empty only when the source is already key-unique
    * per batch.
    *
    * `largeBatch` passes through to [[Lakehouse.upsertByKey]]: a CDC
    * stream whose micro-batches can exceed the broadcast-probe
    * distinct-key contract (a bursty backfill replay, a coarse
    * trigger) merges shuffle-side instead of dying on the cap — same
    * semantics, no driver-size dependence. */
  def processMergeBatch(batch: DataFrame, batchId: Long, path: String,
      keyCols: Seq[String], zCols: Seq[String], filesPerBatch: Int,
      streamId: String, versionCol: String = "",
      maintenance: Option[Maintenance] = None,
      largeBatch: Boolean = false): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val b =
      if (versionCol.isEmpty) batch
      else graft.operators.Cdc.latestByKey(batch, keyCols, versionCol)
    if (Lakehouse.latestVersion(spark, path) < 0)
      Lakehouse.writeClustered(b, path, zCols, filesPerBatch,
        streamId = streamId, batchId = batchId)
    else if (batchId > Lakehouse.lastCommittedBatch(spark, path, streamId))
      Lakehouse.upsertByKey(spark, path, b, keyCols, filesPerBatch,
        streamId = streamId, batchId = batchId, largeBatch = largeBatch)
    else {
      log.warn(s"lakehouse merge ingest: batch $batchId of stream " +
        s"'$streamId' already committed at $path — fenced, skipping " +
        "(exactly-once)")
      return // a replay is a strict no-op: no maintenance either
    }
    maintenance.foreach(m => runMaintenance(spark, path, zCols, batchId, m))
  }

  /** Starts a MERGE (upsert-by-key) ingest; caller awaits termination.
    * Same wiring as [[start]], with [[processMergeBatch]] as the step. */
  def startMerge(stream: DataFrame, path: String, keyCols: Seq[String],
      zCols: Seq[String], filesPerBatch: Int, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      streamId: String = "", versionCol: String = "",
      maintenance: Option[Maintenance] = None,
      largeBatch: Boolean = false): StreamingQuery = {
    val sid = if (streamId.nonEmpty) streamId else checkpoint
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processMergeBatch(batch, batchId, path, keyCols, zCols,
          filesPerBatch, sid, versionCol, maintenance, largeBatch)
      }
      .start()
  }
}
