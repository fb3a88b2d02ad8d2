package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/**
 * Sessionization: group a user's events into sessions separated by a gap.
 * Two equivalent forms:
 *
 *  - batch: lag/cumulative-sum window (one shuffle on user_id, pure
 *    Catalyst, any scale);
 *  - streaming: KeyValueGroupedDataset.flatMapGroupsWithState with
 *    per-user session state and processing-time timeouts — the custom-
 *    state streaming surface (§2.9/§2.10 north-star).
 */
object Sessionize {

  /**
   * Batch sessionization over (user_id, ts, event_id): a session breaks
   * when the gap to the previous event exceeds `gap`. `ts` must be an
   * integral epoch column; the time UNIT is the caller's — `gap` is
   * interpreted in the same unit as `ts` (callers on the epoch-micros
   * contract pass a micros gap; see core.EventTime). Deterministic
   * ordering tiebreak on event_id.
   */
  def sessionizeBatch(events: DataFrame, gap: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val newSession = when(
      col("ts") - lag(col("ts"), 1).over(w) > gap, 1).otherwise(0)
    events
      .withColumn("_new", newSession)
      .withColumn("session_id",
        sum(col("_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
  }

  // ---- streaming form -------------------------------------------------

  case class Event(event_id: Long, ts: Long, user_id: Long)
  case class SessionState(start: Long, end: Long, n: Long)
  case class Session(user_id: Long, start_ts: Long, end_ts: Long, n_events: Long)

  /**
   * Streaming sessionization: per-user state carries the open session;
   * events extending it merge in, a gap beyond `gap` closes and emits
   * it. State is one small record per active user — bounded by active
   * users, not event volume.
   */
  def sessionizeStream(events: Dataset[Event], gap: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          // within a micro-batch events may arrive unsorted — sort locally
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var open = state.getOption.flatMap(_.headOption)
          val closed = scala.collection.mutable.ListBuffer.empty[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts - s.end <= gap =>
                open = Some(s.copy(end = e.ts, n = s.n + 1))
              case Some(s) =>
                closed += Session(userId, s.start, s.end, s.n)
                open = Some(SessionState(e.ts, e.ts, 1))
              case None =>
                open = Some(SessionState(e.ts, e.ts, 1))
            }
          }
          state.update(open.toList)
          closed.iterator
      }
  }

  // ---- built-in session_window form ----------------------------------

  /**
   * Spark-first sessionization via the native `session_window` operator —
   * the form to prefer when the per-session output is an aggregate (the
   * custom-state form above exists for arbitrary per-session logic).
   * Works identically over batch frames and streams; on a stream, pass
   * `watermark` (e.g. `Some("1 hour")`) and sessions CLOSE when the
   * watermark passes gap beyond their last event — including each key's
   * trailing session, which the flatMapGroupsWithState form can only
   * close on a later event's arrival.
   *
   * Gap-boundary semantics differ from [[sessionizeBatch]] by design of
   * the built-in: `session_window` merges an event at strictly LESS than
   * gap after the previous one, while the lag form merges at <=. Pass
   * `gapMicros + 1` here to reproduce `sessionizeBatch(gapMicros)`
   * exactly (pinned in StreamingSpec).
   *
   * Input contract: `ts` is epoch-micros BIGINT (core.EventTime). Output
   * (user_id, start_us, end_us, n_events), session bounds as observed
   * event times (min/max ts), not the padded window struct — matching
   * the batch form and the q14 oracle.
   */
  def sessionizeWindows(events: DataFrame, gapMicros: Long,
      watermark: Option[String] = None): DataFrame = {
    require(gapMicros >= 1, "gapMicros must be >= 1")
    val timed = events.withColumn("_event_time", timestamp_micros(col("ts")))
    val bounded = watermark.fold(timed)(timed.withWatermark("_event_time", _))
    bounded
      .groupBy(col("user_id"),
        session_window(col("_event_time"), s"$gapMicros microseconds"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_us"), max(col("ts")).as("end_us"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
  }
}
