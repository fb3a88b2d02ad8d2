package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Lakehouse

/**
 * Micro-batch ingest into a [[graft.operators.Lakehouse]] layout: each
 * micro-batch lands as its own z-clustered batch of files plus manifest
 * rows ([[Lakehouse.appendClustered]]; the first batch creates the
 * layout). This is the continuously-maintained form of the nightly
 * append — readers run [[Lakehouse.prunedRead]] against a layout that
 * grows file-granularly while the stream runs, and periodic
 * [[Lakehouse.compact]] folds the micro-batch debris (small files are
 * the KNOWN cost of streaming into a clustered layout; compaction is the
 * maintenance pass, exactly as in Delta/Iceberg deployments).
 *
 * Delivery contract: AT-LEAST-ONCE. `foreachBatch` re-runs a batch after
 * a failure, and this sink has no transaction log to make the second
 * attempt a no-op — a re-run batch appends its rows again. Deployments
 * needing exactly-once put an idempotent key in the data and compact
 * with [[graft.operators.Cdc.latestByKey]] semantics downstream, or
 * fence on `batchId` in an external store. The spec pins the happy-path
 * stream == batch identity; the contract is stated here because the
 * failure path CANNOT be pinned without a txn log by design.
 */
object LakehouseIngest {

  /** Starts the ingest; caller awaits termination. `filesPerBatch` sizes
    * each micro-batch's z-range split — keep it small (micro-batches are
    * small) and let [[Lakehouse.compact]] consolidate. */
  def start(stream: DataFrame, path: String, zCols: Seq[String],
      filesPerBatch: Int, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val fs = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
          val exists =
            fs.exists(new org.apache.hadoop.fs.Path(s"$path/_manifest"))
          if (exists) Lakehouse.appendClustered(batch, path, zCols, filesPerBatch)
          else Lakehouse.writeClustered(batch, path, zCols, filesPerBatch)
        }
      }
      .start()
  }
}
