package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** CONTINUOUS maintenance for the arithmetic-IVM view family
  * ([[graft.sink.MaterializedAgg]]): a streaming query over the
  * `graft-snapshot-stream` source follows the view's SOURCE table and runs
  * one [[graft.sink.MaterializedAgg.refreshTo]] per admitted upstream
  * commit — the full regime machinery (pure-delta fold, extremum-buffer
  * fold, dirty-group recompute, the cost-based pick, the FoldBaseConflict
  * retry against concurrent refreshers) now drives at stream cadence
  * instead of on manual calls.
  *
  * The stream is used as a COMMIT CURSOR, not a data channel: foreachBatch
  * never runs an action on its DataFrame, so the source's slice read stays
  * unexecuted (lazy) and the trigger costs only offset admission — the
  * refresh reads its own bucket-pruned changed slices, exactly as a manual
  * refresh would. Admission control (`maxVersionsPerTrigger`) bounds each
  * micro-batch to a fixed number of upstream versions, so a follower that
  * was down across N commits catches up as N/cap bounded refreshes, and
  * [[graft.sink.MaterializedAgg.refreshTo]] pins each refresh to the
  * admitted head rather than racing past it to the live head.
  *
  * Exactly-once: the refresh ITSELF is the idempotence point (the applied
  * head recorded in the view's manifest gates replays — a re-delivered
  * trigger whose version is already applied is a no-op), so checkpoint
  * replay after a crash re-invokes a refresh that refuses to double-apply.
  */
object MatViewStream {

  /** Start following: one refresh per admitted batch of upstream commits.
    * `maxVersionsPerTrigger` = upstream versions a single refresh may span
    * (1 = strictly per-commit view history).
    */
  def follow(
      spark: SparkSession,
      view: graft.sink.MaterializedAgg,
      checkpoint: String,
      maxVersionsPerTrigger: Int = 1,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    spark.readStream.format("graft-snapshot-stream")
      .option("maxVersionsPerTrigger", maxVersionsPerTrigger.toString)
      .load(view.source.dir)
      .writeStream
      .queryName(s"matview_follow_${MaterializedAggNameOf(view)}")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        // advance to the trigger-time head in cap-bounded refreshes, driven
        // off the view's own applied head (the batch frame is only the
        // wake-up signal and is never executed). The loop covers the
        // fresh-checkpoint-over-lagging-view edge, where one trigger must
        // catch up several versions; steady state runs exactly one
        // refresh per admitted commit
        val head = view.source.currentVersion
        head.foreach { h =>
          var done = false
          while (!done) view.appliedVersion match {
            case Some(a) if a >= h => done = true // current (or replayed trigger)
            case Some(a) =>
              view.refreshTo(spark, math.min(a + maxVersionsPerTrigger, h))
              ()
            case None =>
              view.refreshTo(spark, h) // initial build is version-atomic
              ()
          }
        }
      }
      .start()

  private def MaterializedAggNameOf(view: graft.sink.MaterializedAgg): String =
    new java.io.File(view.sink.dir).getName
}
