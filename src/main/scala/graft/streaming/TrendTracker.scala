package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.sink.HeavyHitterStore

/** Continuous frequent-items tracking — the streaming composition of
  * [[graft.sink.HeavyHitterStore]], completing the store triad's streaming
  * surface ([[NearDupAdmission]] = similarity, [[CardinalityTracker]] =
  * cardinality, this = frequency): every micro-batch commits its ≤ k-row
  * Misra–Gries partial and the caller receives the merged running
  * candidates with their additive error bound. Per-batch cost is one pass
  * over the NEW rows with a counter-bounded shuffle — the Zipf tail never
  * leaves its batch — so "what's trending since the stream began" stays
  * answerable at any stream age. Replay safety: a replayed batch
  * overwrites its own `batch=<id>` partial idempotently.
  */
object TrendTracker {

  /** Starts tracking over a streaming frame. `onBatch(candidates, bound,
    * batchId)`: merged (item, est) rows — true counts lie in
    * [est, est + bound], and every item with true count > bound appears.
    * Materialize inside the callback.
    */
  def start(rows: DataFrame, store: HeavyHitterStore, itemCol: Column,
      checkpoint: String, onBatch: (DataFrame, Long, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batch, itemCol, batchId)
        val (cand, bound) = store.candidates(batch.sparkSession)
        onBatch(cand, bound, batchId)
      }
      .start()
}
