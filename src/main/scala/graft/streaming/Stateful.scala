package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operators via `KeyValueGroupedDataset` +
  * `mapGroupsWithState` — the engine's surface for semantics windowed
  * aggregation can't express (running counters, per-key machines, custom
  * eviction). State lives in the state store (checkpoint-backed, partitioned
  * by key), so it scales with distinct keys per executor, not stream volume.
  */
object Stateful {

  final case class UserEvent(user_id: Long, event_id: Long, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, sum_value: Double, max_event_id: Long)

  /** Running per-user statistics over an unbounded stream. Event-time
    * processing order within a micro-batch is not guaranteed — the state
    * update is commutative (count/sum/max), which is what makes it correct
    * under reordering (same principle as the CDC sink's seq-based merge).
    */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0.0, Long.MinValue))
          val next = batch.foldLeft(prev) { (s, e) =>
            UserStats(user, s.n_events + 1, s.sum_value + e.value, math.max(s.max_event_id, e.event_id))
          }
          state.update(next)
          next
      }(Encoders.product[UserStats], Encoders.product[UserStats])
  }

  /** Output mode required by mapGroupsWithState. */
  val outputMode: OutputMode = OutputMode.Update()
}
