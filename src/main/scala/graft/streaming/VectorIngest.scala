package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.sink.VectorIndexStore

/** Continuous vector-index maintenance — the streaming composition of
  * [[graft.sink.VectorIndexStore]], and the ANN twin of
  * [[CardinalityTracker]]: centroids are trained ONCE offline
  * (`store.init` on a bootstrap corpus — the layout decision a serving
  * system makes before going live), then every micro-batch of new
  * embeddings is assigned to the frozen cells and committed as its own
  * `_SUCCESS`-gated cell-partitioned batch dir. Searches run against the
  * accumulated store at any time and see exactly the committed batches;
  * per-batch cost is one narrow assignment pass over the NEW vectors (the
  * accumulated corpus is never re-read or re-clustered).
  *
  * Crash/replay safety comes from the store's per-batch overwrite: frozen
  * centroids make assignment deterministic, so a replayed micro-batch
  * rewrites its own dir with identical content and search results are
  * unchanged (test-pinned, like the other store streams). Centroid drift
  * is handled offline: retrain into a NEW index dir, swap readers.
  */
object VectorIngest {

  /** Starts continuous ingest into an initialized store. `onBatch(store,
    * batchId)` fires after each batch's vectors commit — search inside the
    * callback for ingest-synchronous reads.
    */
  def start(rows: DataFrame, store: VectorIndexStore, checkpoint: String,
      onBatch: (VectorIndexStore, Long) => Unit = (_, _) => (),
      idCol: String = "vec_id", embCol: String = "embedding",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batch, batchId, idCol = idCol, embCol = embCol)
        onBatch(store, batchId)
      }
      .start()
}
