package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.engine.Dfs

/** Continuous referential-integrity monitoring — the streaming twin of
  * [[graft.inspect.Inspection.fkOrphans]]: per-table CDC applies are never
  * transactionally consistent ACROSS tables, so a child batch can land
  * before its parent's insert (a TRANSIENT orphan that heals once the
  * parent stream catches up) or after the parent's hard delete (a
  * PERSISTENT orphan that demands attention). This monitor separates the
  * two over time, which a one-shot batch check cannot: every micro-batch
  * of child rows is anti-joined against the CURRENT replicated parent
  * state, new orphans accumulate into a persistent outstanding set, and
  * previously outstanding keys whose parent has since arrived are HEALED
  * (dropped) — what remains outstanding across batches is the persistent
  * kind.
  *
  * State contract: the outstanding set lives under `stateDir/v=<batchId>`
  * (full ≤-orphan-count-sized rewrite per batch — orphans are bounded by
  * integrity violations, not data volume), `_SUCCESS`-gated like the sketch
  * stores; readers take the LATEST committed version, so a crash mid-write
  * leaves the previous state visible and the replayed batch recommits its
  * version. A replay after the parent state advanced heals earlier — the
  * monitor converges to current truth rather than replaying history, which
  * is the semantics a health check wants.
  *
  * Scale shape: per batch, ONE distinct-collapse of the parent key column
  * (dimension-sized → broadcast), one left-anti equi-join of the NEW child
  * rows, one anti-join of the (tiny) outstanding set — the accumulated
  * child stream is never re-read.
  */
object IntegrityMonitor {

  /** Latest committed outstanding-orphan frame `(orphan_key, n_child_rows)`,
    * or None if no version has committed yet.
    */
  def outstanding(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val d = new Path(stateDir)
    val fs = Dfs.fs(d)
    if (!fs.exists(d)) return None
    val versions = Dfs.list(d)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(s => (s.getPath.getName.stripPrefix("v=").toLong, s.getPath.toString))
    if (versions.isEmpty) None
    else Some(spark.read.parquet(versions.maxBy(_._1)._2))
  }

  /** Starts monitoring a streaming frame of child rows. `parentState` is
    * re-evaluated every batch (read the replicated parent table as of now);
    * `onBatch(outstanding, batchId)` receives the post-commit outstanding
    * set. Materialize inside the callback.
    */
  def start(child: DataFrame, childKey: String,
      parentState: SparkSession => DataFrame, parentKey: String,
      stateDir: String, checkpoint: String,
      onBatch: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    child.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val parents = broadcast(
          parentState(s).select(col(parentKey).as("__pk")).distinct())
        val batchOrphans = batch
          .join(parents, col(childKey) === col("__pk"), "left_anti")
          .groupBy(col(childKey).as("orphan_key"))
          .agg(count(lit(1)).cast("long").as("n_child_rows"))
        val prior = outstanding(s, stateDir).getOrElse(batchOrphans.limit(0))
        // healing: an outstanding key whose parent has since replicated
        val still = prior.join(parents, col("orphan_key") === col("__pk"), "left_anti")
        val next = still.select(col("orphan_key"), col("n_child_rows"))
          .unionByName(batchOrphans)
          .groupBy("orphan_key")
          .agg(sum(col("n_child_rows")).cast("long").as("n_child_rows"))
        next.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
        onBatch(outstanding(s, stateDir).get, batchId)
      }
      .start()
}
