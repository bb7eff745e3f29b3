package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.sink.HllSketchStore

/** Continuous cardinality tracking — the streaming composition of
  * [[graft.sink.HllSketchStore]], and the COUNT-DISTINCT twin of
  * [[NearDupAdmission]]: every micro-batch appends its per-group HLL
  * partials to the persistent store (one tiny write, sized by group count
  * not batch rows) and the caller receives the merged running estimates.
  * The accumulated stream is never re-read — per-batch cost is one pass
  * over the NEW rows, query cost is (groups × batches) sketch rows, the
  * property that keeps "distinct users per type, ever" answerable after a
  * year of ingest.
  *
  * Crash/replay safety comes from the store's per-batch overwrite: a
  * replayed micro-batch rewrites its own `batch=<id>` partials with
  * identical content and touches nothing else, so estimates are unchanged
  * by replay (test-pinned, like the admission stream's keyed upserts).
  */
object CardinalityTracker {

  /** Starts tracking over a streaming frame. `onBatch(estimates, batchId)`
    * receives the merged per-group running estimates after each batch's
    * partials commit. Materialize inside the callback.
    */
  def start(rows: DataFrame, store: HllSketchStore, groupCols: Seq[String],
      valueCol: String, checkpoint: String,
      onBatch: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batch, groupCols, valueCol, batchId)
        onBatch(store.estimates(batch.sparkSession, groupCols), batchId)
      }
      .start()
}
