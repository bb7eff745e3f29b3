package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.sink.TextIndexStore

/** Continuous text-index maintenance — the streaming composition of
  * [[graft.sink.TextIndexStore]], and the retrieval twin of
  * [[VectorIngest]]: every micro-batch of new documents is tokenized once
  * and committed as its own `_SUCCESS`-gated postings + doc-length batch
  * dir. BM25 / phrase / proximity searches run against the accumulated
  * store at any time and see exactly the committed batches; per-batch cost
  * is one tokenization pass over the NEW documents — the standing corpus
  * is never re-read or re-tokenized, which is what makes "search
  * everything ever crawled" affordable on a live feed.
  *
  * Crash/replay safety comes from the store's per-batch overwrite:
  * tokenization is deterministic, so a replayed micro-batch rewrites its
  * own dir with identical content and search results are unchanged
  * (test-pinned, like the other store streams). Batch-dir sprawl is
  * handled by `store.compact` during a search quiet window.
  */
object TextIngest {

  /** Starts continuous ingest. `onBatch(store, batchId)` fires after each
    * batch's postings commit — search inside the callback for
    * ingest-synchronous reads.
    */
  def start(rows: DataFrame, store: TextIndexStore, checkpoint: String,
      onBatch: (TextIndexStore, Long) => Unit = (_, _) => (),
      idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(batch, batchId, idCol = idCol, textCol = textCol)
        onBatch(store, batchId)
      }
      .start()
}
