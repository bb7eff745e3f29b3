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

  /** The same semantics on Spark 4's `transformWithState` — the successor
    * API with explicit typed state handles (ValueState here; List/Map state
    * and timers for richer machines). Requires the RocksDB state store
    * provider (`spark.sql.streaming.stateStore.providerClass`).
    */
  class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserStats] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserStats] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      state = getHandle.getValueState[UserStats]("stats",
        Encoders.product[UserStats], org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStats] = {
      val prev = if (state.exists()) state.get() else UserStats(key, 0L, 0.0, Long.MinValue)
      val next = rows.foldLeft(prev) { (s, e) =>
        UserStats(key, s.n_events + 1, s.sum_value + e.value, math.max(s.max_event_id, e.event_id))
      }
      state.update(next)
      Iterator.single(next)
    }
  }

  def runningUserStatsTws(events: Dataset[UserEvent]): Dataset[UserStats] =
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())(
        Encoders.product[UserStats])
}
