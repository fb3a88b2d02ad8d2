package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.TemporalJoin

/**
 * Streaming as-of enrichment: each micro-batch of an event stream picks
 * up the latest at-or-before row of a STATIC reference table (rates,
 * model versions, config epochs) via `TemporalJoin.asofJoin`.
 *
 * Structured Streaming's native stream-static join is equality-only, and
 * an inequality condition would nested-loop per batch; routing each
 * micro-batch through the batch as-of operator keeps the one-shuffle
 * window plan AND gives batch/stream result equality by construction —
 * the same composition the sorted-run sink uses (`foreachBatch` over a
 * proven batch operator, EventsIngest.scala).
 *
 * The reference side is captured once at stream start (a DataFrame over
 * static storage re-evaluates per batch unless cached — callers pass a
 * cached/checkpointed frame for stable semantics across batches).
 */
object StreamingEnrich {

  /**
   * Writer that appends enriched micro-batches via `sink`. Semantics per
   * batch are EXACTLY `TemporalJoin.asofJoin(batch, reference, ...)` —
   * StreamingSpec pins stream == batch on the same input.
   */
  def asofEnrichWriter(stream: DataFrame, reference: DataFrame,
      keyCols: Seq[String], leftTimeCol: String, rightTimeCol: String,
      rightCols: Seq[String], tiebreakCols: Seq[String] = Nil,
      prefix: String = "asof_",
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val enriched = TemporalJoin.asofJoin(batch, reference, keyCols,
          leftTimeCol, rightTimeCol, rightCols, tiebreakCols, prefix)
        sink(enriched, batchId)
      }
  }

  /**
   * Stream-STREAM interval join: rows of two live streams matched on
   * equality keys plus `rightTime ∈ [leftTime + lower, leftTime + upper]`.
   * This is Structured Streaming's native windowed-join form — the
   * equality keys make the join plannable and the time bounds (with the
   * watermarks the CALLER must have set on both inputs) let the engine
   * EXPIRE join state: without them, both sides buffer forever. State per
   * key is bounded by watermark lag + window span — the streaming analog
   * of `TemporalJoin.intervalJoin`'s bounded bins. Both sides' column
   * names must be disjoint apart from `keyCols` (rename before joining a
   * stream to itself).
   *
   * `lower`/`upper` are SQL interval literals (e.g. "0 seconds",
   * "10 minutes"); StreamingSpec pins stream == batch equality.
   */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTimeCol: String, rightTimeCol: String,
      lower: String, upper: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val cond = (keyCols.map(k => left(k) === right(k)) :+
      (right(rightTimeCol) >= left(leftTimeCol) + expr(s"INTERVAL $lower")) :+
      (right(rightTimeCol) <= left(leftTimeCol) + expr(s"INTERVAL $upper")))
      .reduce(_ && _)
    keyCols.foldLeft(left.join(right, cond))((d, k) => d.drop(right(k)))
  }
}
