package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sink.SnapshotCatalog

/** Streaming multi-table transactions: ONE micro-batch stream fans out into
  * several [[SnapshotCatalog]] member tables, and every micro-batch ends
  * with ONE atomic catalog cut pinning all members — so catalog readers see
  * per-micro-batch consistent cross-table state, never a torn cut, under
  * kill-and-restart (the streaming twin of the batch q61i transaction).
  *
  * Exactly-once shape per micro-batch:
  *   1. replay guard: if this (writerId, batchId) epoch is already recorded
  *      in catalog history, the whole batch — merges AND cut — committed
  *      before the crash; skip everything (no duplicate table versions, no
  *      duplicate catalog versions);
  *   2. merge each member's slice (seq-keyed last-write-wins absorbs any
  *      partial replay of a crash BETWEEN merges);
  *   3. `commitEpoch`: one rename-locked catalog publish stamped with the
  *      epoch. A crash between step 2 and 3 leaves tables advanced but
  *      unpinned — readers keep the previous cut; the restart replays the
  *      batch and re-commits.
  *
  * Scale shape: the batch is persisted once and sliced per member (each
  * member's merge reads only the buckets its slice touches); the catalog
  * publish is one small-file rename — per-batch metadata cost is O(members),
  * independent of data volume.
  */
object CatalogTxnStream {

  /** One member table of the transaction: `slice` carves the member's rows
    * out of the multiplexed micro-batch (typically a discriminator-column
    * filter plus projection). `keys` overrides the stream-level merge keys
    * for this member — a dimension table sliced out of the same feed is
    * usually keyed by its natural key, not the fact key (a join view
    * requires the dim merged by exactly the join keys).
    */
  final case class Member(name: String, slice: DataFrame => DataFrame,
      nBuckets: Int = 16, keys: Seq[String] = Nil)

  /** @param views maintained views refreshed INSIDE each transaction, after
    *   the member merges and before the cut — every pinned catalog version
    *   then carries (table, view) pairs where the view reflects EXACTLY the
    *   pinned table state, so a dashboard reading the cut never sees a
    *   rollup lag its fact table. Aggregate views, join views and cascades
    *   all qualify ([[graft.sink.MaintainedView]]); declare cascades
    *   BOTTOM-UP — views refresh in declaration order. Each name must be
    *   the view sink's table name under the catalog root (that is what the
    *   cut pins). A crash between refresh and cut leaves readers on the
    *   previous cut; the replay re-merges idempotently and re-refreshes
    *   before re-cutting.
    */
  def start(
      events: DataFrame,
      catalog: SnapshotCatalog,
      members: Seq[Member],
      keys: Seq[String],
      seqCol: String,
      isDeleteCol: String,
      checkpoint: String,
      writerId: String,
      views: Seq[(String, graft.sink.MaintainedView)] = Nil): StreamingQuery = {
    require(members.nonEmpty, "a catalog transaction needs at least one member table")
    views.foreach { case (name, v) =>
      require(v.sink.dir == s"${catalog.root}/$name",
        s"view $name must materialize under the catalog root to be pinnable: " +
          s"expected ${catalog.root}/$name, got ${v.sink.dir}")
    }
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // fully-replayed epoch: merges and cut already landed — re-running
        // the merges would publish orphan (unpinned) table versions for no
        // benefit, so the whole batch is skipped
        if (!catalog.lastEpoch(writerId).exists(_ >= batchId)) {
          val pinned = batch.persist()
          try {
            members.foreach { m =>
              // openTable: self-aligns to the member's committed layout, so
              // a mid-stream rebucket re-routes the next merge instead of
              // wedging the pipeline (m.nBuckets only seeds a NEW member)
              catalog.openTable(m.name, m.nBuckets)
                .merge(m.slice(pinned),
                  if (m.keys.nonEmpty) m.keys else keys, seqCol, isDeleteCol)
            }
            // views advance INSIDE the transaction: refreshed after the
            // merges (in declaration order — cascades bottom-up), pinned by
            // the same cut; a view whose source has no data yet waits
            views.foreach(_._2.refreshIfReady(batch.sparkSession))
            // only members/views that have ever received rows are pinnable;
            // one whose every batch sliced empty so far has no version
            val present = (members.map(_.name) ++ views.map(_._1))
              .filter(n => graft.sink.SnapshotParquetSink
                .versions(s"${catalog.root}/$n").nonEmpty)
            if (present.nonEmpty) {
              catalog.commitEpoch(present, writerId, batchId)
              ()
            }
          } finally {
            pinned.unpersist()
            ()
          }
        }
      }
      .start()
  }
}
