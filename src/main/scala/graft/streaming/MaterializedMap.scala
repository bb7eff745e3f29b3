package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sink.{MaintainedView, SnapshotParquetSink}

/** Per-row TRANSFORM view — the MAP leg of the maintained-view family
  * (map / aggregate / join): a downstream snapshot table kept equal to
  * `transform(source state)` by [[TableFollower]]'s changed-bucket
  * catch-up, packaged as a [[MaintainedView]] so enrichment hops
  * participate in streaming catalog transactions and cascades
  * ([[CatalogTxnStream.start]]'s `views`) exactly like aggregates and
  * joins do — a reader of any committed cut sees the enriched table
  * consistent with its source, never lagging, never ahead.
  *
  * Transform contract = the follower's: row-wise, keys/seq/`is_deleted`
  * pass through, filter by tombstoning. Durability note: unlike
  * agg/join views (whose specs [[graft.sink.ViewSpecs]] persists), a map
  * view's transform is a Scala closure — the SQL-durable equivalent is
  * the `table_follow` table function, which carries the transform as
  * selectExpr strings and is stateless per call (the follower checkpoint
  * lives in the downstream table dir).
  */
final class MaterializedMap(
    val source: SnapshotParquetSink,
    val sink: SnapshotParquetSink,
    keys: Seq[String],
    transform: DataFrame => DataFrame,
    seqCol: String = "seq",
    followerName: String = "map") extends MaintainedView {

  private val follower = new TableFollower(source.dir, sink, followerName)

  override def refreshIfReady(spark: SparkSession): Unit =
    if (source.currentVersion.nonEmpty) {
      follower.catchUp(spark, keys, seqCol)(transform)
      ()
    }
}
