package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.MisraGries

/**
 * Streaming heavy hitters: a Misra-Gries sketch per group carried as
 * flatMapGroupsWithState state, emitting the group's current top-k
 * every micro-batch that touches it (Update mode). The SAME sketch core
 * (graft.core.MisraGries) as the batch `topk_freq` aggregate, so the
 * streaming answer after the last batch equals the batch answer over
 * the same data — exactly when distinct items stay within `capacity`,
 * within the n/(capacity+1) MG bound otherwise.
 *
 * State is bounded by construction: at most `capacity` (item, counter)
 * pairs per group FOREVER, no watermark needed for correctness — the
 * sketch, not the stream, bounds the memory (the unbounded-state
 * alternative, streaming `groupBy(item).count()`, keeps one row of
 * state per DISTINCT item and grows with the corpus). Item order inside
 * a micro-batch doesn't matter when distinct <= capacity (counts exact);
 * past capacity the estimates are order-sensitive the same way any MG
 * ingestion is — the survival/undercount guarantees still hold.
 */
object HeavyHitters {

  case class Item(group: String, item: String)
  case class TopEntry(item: String, est: Long)
  case class GroupTop(group: String, top: Seq[TopEntry])

  def heavyHittersStream(items: Dataset[Item], capacity: Int, k: Int): Dataset[GroupTop] = {
    require(capacity > 0, "capacity must be positive")
    require(k > 0 && k <= capacity, "k must be in 1..capacity")
    import items.sparkSession.implicits._
    items
      .groupByKey(_.group)
      .flatMapGroupsWithState[Map[String, Long], GroupTop](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[Item], state: GroupState[Map[String, Long]]) =>
          val sketch = mutable.HashMap.empty[String, Long]
          state.getOption.foreach(_.foreach { case (s, c) => sketch.update(s, c) })
          it.foreach(e => if (e.item != null) MisraGries.add(sketch, e.item, capacity))
          state.update(sketch.toMap)
          Iterator.single(GroupTop(group,
            MisraGries.topK(sketch, k).map { case (s, c) => TopEntry(s, c) }))
      }
  }
}
