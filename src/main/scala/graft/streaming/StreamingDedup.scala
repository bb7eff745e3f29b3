package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact streaming deduplication with BOUNDED state (SURVEY §3.5).
  *
  * `dropDuplicates(keys)` on a stream keeps every key it has ever seen
  * unless the event-time column is itself part of the dedup key — at
  * 100 TB feeds the state store grows without bound. `withinWatermark`
  * uses `dropDuplicatesWithinWatermark`, which evicts a key's state once
  * the watermark passes its event time: memory is bounded by
  * (arrival rate × delay), under the contract that a duplicate arrives
  * within `delay` of the original — the actual failure mode of
  * at-least-once CDC/event feeds, whose duplicates are reconnect-local.
  */
object StreamingDedup {

  def withinWatermark(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
