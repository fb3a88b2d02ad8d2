package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming deduplication: exact-dup suppression on a continuous ingest.
 * `dropDuplicatesWithinWatermark` keeps state only for the watermark
 * horizon — the streaming analog of the batch fingerprint dedup, with
 * state bounded by (arrival rate x watermark) instead of corpus size.
 */
object StreamingDedup {

  /**
   * Deduplicate a stream by content fingerprint within a watermark.
   * `tsCol` must be an event-time timestamp column; duplicates of a
   * fingerprint arriving within `watermark` of the first sighting are
   * dropped.
   */
  def dedupStream(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame = {
    stream
      .withColumn("fingerprint", graft.operators.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
  }
}
