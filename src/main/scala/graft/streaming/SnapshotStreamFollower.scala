package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StructField, StructType}
import graft.sink.{DeleteMode, SnapshotParquetSink}

/** Orchestrated consumer of the `graft-snapshot-stream` source: a
  * readStream → foreachBatch last-write-wins merge into a downstream
  * snapshot table, plus the SCHEMA-ADOPTION cycle the frozen-schema
  * streaming contract otherwise leaves manual.
  *
  * The source freezes its schema at stream start (the Structured
  * Streaming contract — a running query's plan cannot grow columns), so
  * an upstream evolution lands in the stream only after a restart. The
  * CdcStream edit–redeploy loop ([[SchemaEvolution.evolveAndRestart]],
  * the reference's R23/R24 redeploy semantics,
  * /root/reference/add_output.py:154-206,656) already mechanizes
  * detect → stop → restart for CDC specs; this follower wires the same
  * orchestration for snapshot-stream consumers:
  *
  *   - [[newColumns]] diffs the upstream head's recorded schema against
  *     the running query's frozen shape — a manifest read, never a data
  *     scan.
  *   - [[adoptAndRestart]] stops the query and restarts it ON THE SAME
  *     CHECKPOINT. Offsets resume where they left off (zero row loss,
  *     no re-snapshot); the restarted query's frozen schema includes the
  *     new columns, and the downstream merge null-fills history rows the
  *     moment the first evolved batch unions in.
  *
  * Restart safety at scale: the restart costs one streaming
  * start/stop (seconds), NOT a table rescan — the first post-restart
  * batch is the same changed-slice read the pre-restart trigger would
  * have run, and admission control caps it like any other batch.
  */
object SnapshotStreamFollower {

  /** What to follow and where to land it. `downKeys`/`downSeqCol` are the
    * downstream merge contract (the upstream batch arrives Logical-shaped,
    * tombstones as `is_deleted = true` rows, so deletes forward).
    */
  final case class FollowSpec(
      upDir: String,
      downDir: String,
      checkpoint: String,
      downKeys: Seq[String],
      downSeqCol: String = "seq",
      downBuckets: Int = 8,
      maxVersionsPerTrigger: Option[Int] = None,
      trigger: Trigger = Trigger.ProcessingTime(0L))

  /** A running follow: the query plus the schema it froze at start — the
    * baseline [[newColumns]] diffs against.
    */
  final class Running private[SnapshotStreamFollower] (
      val query: StreamingQuery, val frozen: StructType)

  def start(spark: SparkSession, spec: FollowSpec): Running = {
    val reader = spark.readStream.format("graft-snapshot-stream")
    spec.maxVersionsPerTrigger.foreach(m =>
      reader.option("maxVersionsPerTrigger", m.toString))
    val df = reader.load(spec.upDir)
    val frozen = df.schema
    val q = df.writeStream
      .option("checkpointLocation", spec.checkpoint)
      .trigger(spec.trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val sink =
            if (SnapshotParquetSink.versions(spec.downDir).nonEmpty)
              SnapshotParquetSink.forTable(spec.downDir)
            else new SnapshotParquetSink(spec.downDir, nBuckets = spec.downBuckets)
          sink.merge(batch, spec.downKeys, spec.downSeqCol, "is_deleted")
        }
        ()
      }
      .start()
    new Running(q, frozen)
  }

  /** Upstream columns the running query's frozen schema does not carry:
    * the recorded head schema (manifest line — no footer scan) minus the
    * frozen fields, internal columns excluded. Empty ⇒ nothing to adopt.
    */
  def newColumns(spark: SparkSession, spec: FollowSpec,
      frozen: StructType): Seq[StructField] = {
    val head = SnapshotParquetSink.forTable(spec.upDir)
      .read(spark, DeleteMode.Logical).schema
    val have = frozen.fieldNames.toSet
    head.fields.toSeq.filterNot(f => have(f.name))
  }

  /** The adoption cycle: if the upstream head carries columns the running
    * query froze out, stop → restart on the same checkpoint. Returns the
    * new running follow, or None when the schemas already agree (the
    * query keeps running untouched). Call it on whatever cadence schema
    * changes deserve — per deploy, per monitor tick; it costs one
    * manifest read when there is nothing to do.
    */
  def adoptAndRestart(spark: SparkSession, running: Running,
      spec: FollowSpec): Option[Running] = {
    if (newColumns(spark, spec, running.frozen).isEmpty) None
    else {
      running.query.stop()
      running.query.awaitTermination()
      Some(start(spark, spec))
    }
  }
}
