package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.sink.CountStore

/** Continuous rate-anomaly monitoring — the streaming twin of
  * `Inspection.rateAnomalies` (q66e) and the RATE leg of the monitor
  * family next to [[CardinalityTracker]] (distinct) and [[TrendTracker]]
  * (frequency): every micro-batch appends its (event_type, hour) grouped
  * counts to a persistent [[CountStore]] (one tiny write, sized by
  * type×hour, not batch rows), and the caller receives the anomaly
  * ranking over the MERGED running counts — scored by the exact same
  * `rateAnomalyScores` the batch query runs (shared code, so the
  * discrete-median baselines can never diverge). A micro-batch split
  * across an hour boundary is handled by the additive merge: partial
  * hours sum across batches into the same (type, hour) key.
  *
  * Crash/replay safety is the store family's per-batch overwrite: a
  * replayed micro-batch rewrites its own `batch=<id>` partials with
  * identical content, so scores are unchanged by replay (test-pinned).
  */
object RateMonitor {

  /** Starts monitoring. `onBatch(anomalies, batchId)` receives the
    * running top-`topK` anomaly ranking after each batch's counts commit.
    * Materialize inside the callback.
    */
  def start(rows: DataFrame, store: CountStore, checkpoint: String,
      onBatch: (DataFrame, Long) => Unit, topK: Int = 20,
      tsCol: String = "ts", typeCol: String = "event_type",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    rows.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.append(
          batch.select(col(typeCol).as("event_type"),
            unix_micros(date_trunc("hour", col(tsCol))).as("hour_us")),
          Seq("event_type", "hour_us"), batchId)
        onBatch(anomalies(batch.sparkSession, store, topK), batchId)
      }
      .start()

  /** The running anomaly ranking over everything ever committed. */
  def anomalies(spark: SparkSession, store: CountStore, topK: Int = 20): DataFrame =
    graft.inspect.Inspection.rateAnomalyScores(
      store.counts(spark, Seq("event_type", "hour_us")), topK)
}
