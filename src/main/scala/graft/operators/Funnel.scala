package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.LongType

/**
 * First-touch funnel analysis over an event stream — the product-analytics
 * staple (signup→activation→purchase conversion) and, for training-data
 * pipelines, the canonical "ordered-sequence-within-window" shape (e.g.
 * crawl→parse→dedup-survive per document lineage).
 *
 * Semantics (the deterministic first-touch form): stage 1 matches each
 * user's EARLIEST stage-1 event at time t1; stage i>1 matches the earliest
 * stage-i event at-or-after the stage-(i-1) match, and the whole chain
 * must complete within `windowMicros` of t1. A user missing stage i has
 * t_i..t_k null. One output row per user that entered the funnel.
 *
 * Scale shape: stage i is one equi-join on the user key with the time
 * bounds as a residual predicate, followed by a min() aggregation — the
 * left side is the (monotonically shrinking) entrant set, the right side
 * a type-filtered scan whose `event_type = stage` predicate pushes down
 * to parquet. k stages cost k-1 joins, each shuffling only entrants +
 * one event type — never the full event log at once, no per-user
 * collect_list state, no window-function sort over the whole log.
 */
object Funnel {

  /**
   * @param events  event frame; `tsCol` must be epoch-micros BIGINT
   *                (normalize via [[graft.core.EventTime]])
   * @param stages  ordered distinct event-type names, length >= 1
   * @return one row per user with stage-1: (userCol, t1..tk, stages_reached)
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], windowMicros: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    require(windowMicros > 0, "windowMicros must be positive")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for (i <- 2 to stages.size) {
      val si = events.filter(col(typeCol) === stages(i - 1))
        .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
      val carried = acc.columns.toSeq
      // left join keeps users who stall at stage i-1 (their t_{i-1} is
      // null -> the join condition is null -> min over no rows -> null,
      // so nulls propagate through later stages for free)
      acc = acc.join(si,
          acc(userCol) === si("_u") && col("_ts") >= col(s"t${i - 1}") &&
            col("_ts") <= col("t1") + lit(windowMicros), "left")
        .groupBy(carried.map(col): _*)
        .agg(min(col("_ts")).as(s"t$i"))
    }
    val reached = stages.indices.map(i =>
      when(col(s"t${i + 1}").isNotNull, 1).otherwise(0)).reduce(_ + _)
    acc.withColumn("stages_reached", reached.cast(LongType))
  }

  // ---- streaming form -------------------------------------------------

  case class FEvent(user_id: Long, ts: Long, event_type: String)

  /** One row per user per micro-batch in which the chain ADVANCED:
    * `times(i)` is the stage-(i+1) match, `stages_reached = times.size`. */
  case class FunnelProgress(user_id: Long, times: Seq[Long], stages_reached: Int)

  /**
   * Streaming first-touch funnel via per-user custom state
   * (flatMapGroupsWithState): state is the matched-time chain so far —
   * one tiny record per user, bounded by users, not event volume. Each
   * micro-batch sorts its slice by `(ts, stage position)` (the stage
   * tiebreak makes same-instant A→B chains match, mirroring the batch
   * form's `>=`) and advances the chain greedily; because stage i's
   * match is the EARLIEST eligible event and events are consumed in time
   * order, in-order delivery reproduces [[funnel]] exactly (pinned in
   * StreamingSpec). Cross-batch LATE events cannot retract an already-
   * matched earlier stage — the usual watermark trade every streaming
   * first-touch metric makes.
   */
  def funnelStream(events: Dataset[FEvent], stages: Seq[String],
      windowMicros: Long): Dataset[FunnelProgress] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      "funnel stages must be non-empty and distinct")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], FunnelProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, it, state) =>
          var matched = state.getOption.getOrElse(Nil)
          val before = matched.size
          val sorted = it.toSeq
            .sortBy(e => (e.ts, stageIdx.getOrElse(e.event_type, Int.MaxValue)))
          sorted.foreach { e =>
            if (matched.size < stages.size &&
                e.event_type == stages(matched.size)) {
              if (matched.isEmpty) matched = List(e.ts)
              else if (e.ts >= matched.last &&
                  e.ts <= matched.head + windowMicros)
                matched = matched :+ e.ts
            }
          }
          if (matched.size > before) {
            state.update(matched)
            Iterator.single(FunnelProgress(uid, matched, matched.size))
          } else Iterator.empty
      }
  }

  /** Stage-level conversion summary derived from [[funnel]]: one row per
    * stage ordinal with the count of users whose chain reached it. */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], windowMicros: Long): DataFrame = {
    val f = funnel(events, userCol, tsCol, typeCol, stages, windowMicros)
    f.select(explode(sequence(lit(1L), col("stages_reached"))).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("users"))
  }
}
