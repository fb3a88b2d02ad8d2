package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.CqlPipeline
import graft.operators.CqlPipeline.Projection
import graft.sinks.{BulkSink, LoaderPlan, StreamLoader}

/**
 * Structured-Streaming ingest: the reference is batch-only (its "streaming"
 * is SSTable file transfer, CrunchCqlBulkRecordWriter.java:153-181); this is
 * the north-star extension — a continuous ingest of the `events` table into
 * the same ring-aligned bulk-load spine.
 *
 * Dataflow: readStream(parquet) -> watermarked tumbling-window aggregation
 * -> foreachBatch -> CQL projection -> BulkSink.writeSorted. Each
 * micro-batch becomes one sorted bulk load — exactly how a real cluster
 * ingests a firehose without write-path compaction pressure. State is
 * bounded by the watermark; the bulk-load stage is stateless per batch.
 */
object EventsIngest {

  /** Fallback stream schema for a directory with no parquet yet (the 24/7
    * ingest may start BEFORE the first file lands): current Spark mounts
    * the events `ts` parquet column as TIMESTAMP_NTZ, and EventTime
    * normalizes either flavor downstream anyway. */
  val fallbackEventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema of the events stream as mounted on disk. `readStream` needs an
    * explicit schema; the `ts` physical type varies by writer/runtime
    * (epoch-nanos BIGINT under the old legacy-conf read, TIMESTAMP_NTZ
    * under current Spark), so it is resolved from the parquet footers —
    * a one-footer driver read, same cost as any schema inference — and
    * normalized downstream by [[graft.core.EventTime]]. An empty or
    * not-yet-created directory falls back to [[fallbackEventsSchema]] so
    * stream startup never races the first file — with the caveat that a
    * structured stream's schema is FIXED at start: if the writer's ts
    * flavor differs from the fallback's TIMESTAMP_NTZ guess (legacy
    * INT64-nanos), a stream started against the empty directory stays
    * bound to the guess; start (or restart) after the first file lands
    * to resolve the real footer schema. The catch is NonFatal, not just
    * AnalysisException: a corrupt stray file must also degrade to the
    * fallback rather than crash 24/7 ingest startup. */
  def eventsSchema(spark: SparkSession, eventsDir: String): StructType =
    try spark.read.parquet(eventsDir).schema
    catch { case scala.util.control.NonFatal(e) =>
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"eventsSchema: probe of $eventsDir failed (${e.getMessage}); " +
          "using fallback schema")
      fallbackEventsSchema
    }

  /** Windowed per-type aggregation with a watermark for bounded state.
    * Accepts `ts` as epoch-nanos long OR timestamp (schema-adaptive).
    * Tumbling = hopping with slide == width. */
  def windowedCounts(events: DataFrame): DataFrame =
    windowedCountsSliding(events, width = "1 hour", slide = "1 hour")

  /** Hopping-window variant of [[windowedCounts]] (`slide` < `width`
    * means each event lands in width/slide overlapping windows — the
    * trend-smoothing shape). State is bounded the same way: the
    * watermark closes a window when it passes its END, and overlap
    * multiplies live state only by the constant width/slide factor. The
    * window math is pinned cross-engine by the batch `q38_sliding_window`
    * oracle, which uses the identical `window()` expression. */
  def windowedCountsSliding(events: DataFrame, width: String = "1 hour",
      slide: String = "15 minutes"): DataFrame = {
    val withTime = graft.core.EventTime.withTsUs(events)
      .withColumn("event_time", timestamp_micros(col("ts_us")))
    withTime
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /**
   * Run the full ingest over a parquet directory as a bounded stream
   * (Trigger.AvailableNow): every micro-batch of aggregates is bulk-loaded
   * as sorted runs under `outDir/batch=<id>`. Returns the finished query.
   */
  def ingestOnce(spark: SparkSession, eventsDir: String, outDir: String,
      numBuckets: Int = 4): StreamingQuery =
    runIngest(spark, eventsDir, outDir, numBuckets, mode = "complete")

  /**
   * The 24/7 form: APPEND output with the watermark bounding state — a
   * window's aggregate is emitted (and bulk-loaded) exactly once, when the
   * watermark passes its end; state never grows beyond the watermark lag.
   * Windows still open when a bounded run drains stay in the checkpoint
   * and emit on the next run — restart-safe incremental loads.
   * (`ingestOnce`'s complete mode re-emits everything each batch: right
   * for a bounded demo run, unbounded state on a true firehose.)
   */
  def ingestAppend(spark: SparkSession, eventsDir: String, outDir: String,
      numBuckets: Int = 4): StreamingQuery =
    runIngest(spark, eventsDir, outDir, numBuckets, mode = "append")

  /** A live destination ring for `ingestAndStream`: replica planning
    * inputs plus the wire addresses each logical host listens on. */
  final case class StreamTarget(ring: Seq[LoaderPlan.RingNode], rf: Int,
      endpoints: Map[String, (String, Int)], throttleMBits: Option[Int] = None)

  /**
   * The full firehose-to-ring pipeline: every micro-batch's sorted runs
   * are PLANNED (rf-aware replica sets) and STREAMED to the target as
   * soon as the batch's bulk write commits — the streaming composition
   * of the reference's per-job close() stream (CrunchCqlBulkRecordWriter
   * .java:153-181), continuous instead of one-shot. Failure contract
   * composes with the checkpoint: a batch whose runs reach NO replica
   * throws inside foreachBatch, failing the batch, so a restart replays
   * it from the checkpoint — at-least-once delivery into an idempotent
   * load (writetime = batchId makes replays converge).
   */
  def ingestAndStream(spark: SparkSession, eventsDir: String, outDir: String,
      target: StreamTarget, numBuckets: Int = 4,
      mode: String = "append"): StreamingQuery =
    runIngest(spark, eventsDir, outDir, numBuckets, mode, Some(target))

  private def runIngest(spark: SparkSession, eventsDir: String, outDir: String,
      numBuckets: Int, mode: String,
      target: Option[StreamTarget] = None): StreamingQuery = {
    val stream = spark.readStream
      .schema(eventsSchema(spark, eventsDir)).parquet(eventsDir)
    val agg = windowedCounts(stream)
    val query = agg.writeStream
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val keyed = batch.withColumn("rowkey",
            concat_ws("|", col("event_type"), col("window_start").cast(StringType)))
          val projected = CqlPipeline.toCql(keyed, Projection(
            rowkey = Some("rowkey"),
            defaultTimestampMicros = batchId)) // batch id as writetime: idempotent re-loads
          val batchDir = s"$outDir/batch=$batchId"
          val manifests = BulkSink.writeSorted(projected, Seq("rowkey"), numBuckets,
            batchDir)
          // live target: plan replicas and stream THIS batch's runs now;
          // partial session failures warn (survivable), a run on no
          // replica throws -> the batch fails -> checkpoint replays it
          target.foreach { t =>
            val plan = LoaderPlan.planStreams(manifests, t.ring, t.rf)
            val summary = StreamLoader.stream(batchDir, plan, t.endpoints,
              manifests, throttleMBits = t.throttleMBits)
            summary.failed.foreach(f => System.err.println(
              s"WARN: batch $batchId stream session failed: " +
                s"${f.dataFile} -> ${f.host}: ${f.message}"))
          }
        }
        ()
      }
      .start()
    query.awaitTermination()
    query
  }
}
