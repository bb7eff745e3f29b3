package graft.sink

import org.apache.hadoop.fs.Path
import graft.engine.Dfs

/** Partition-lifecycle maintenance for directory-partitioned tables (the
  * `partitionBy("dt")` layout every 100 TB event table lands in): retention
  * enforcement is a DIRECTORY operation — dropping a day deletes one
  * `dt=<day>` subtree, never opens a data file, and costs O(partitions
  * dropped) regardless of table volume. The complement of planning-time
  * partition pruning (reads skip old days; retention removes them). All
  * filesystem access goes through the Hadoop API ([[graft.engine.Dfs]]),
  * so the table may live on local disk or object storage; footprint
  * preview uses one ContentSummary call per dropped partition, never a
  * client-side walk over data files.
  *
  * Deliberately report-first (the no-silent-caps contract): every call
  * returns exactly what was (or would be) removed — partition values, file
  * counts, bytes — and `dryRun = true` is the default, so a mis-typed
  * cutoff shows its blast radius before anything is deleted.
  *
  * Cutoff comparison is LEXICOGRAPHIC on the encoded partition value:
  * correct for ISO dates (`2026-08-01`), zero-padded hours and any other
  * fixed-width encoding — the encodings partition columns use in practice.
  * Unpadded numerics would mis-order (`9` > `10`); callers own the layout.
  */
object Retention {

  /** One candidate partition: its encoded value and on-disk footprint. */
  final case class PartitionInfo(value: String, files: Long, bytes: Long)

  /** What a retention pass kept and removed (or would — `deleted=false`). */
  final case class RetentionReport(column: String, cutoff: String,
      dropped: Seq[PartitionInfo], kept: Seq[String], deleted: Boolean) {
    def droppedBytes: Long = dropped.map(_.bytes).sum
    def droppedFiles: Long = dropped.map(_.files).sum
  }

  /** The table's partitions for `column`: encoded value → directory. */
  def partitions(dir: String, column: String): Map[String, Path] =
    Dfs.list(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$column="))
      .map(s => s.getPath.getName.stripPrefix(s"$column=") -> s.getPath)
      .toMap

  /** Drops every partition whose encoded value sorts strictly BELOW
    * `cutoff` (exclusive — `cutoff` itself is retained). With the default
    * `dryRun = true` nothing is touched; the report is the preview. A real
    * run that cannot fully delete a partition (open handle, permissions)
    * THROWS rather than returning a report that claims the data is gone.
    */
  def dropPartitionsBelow(dir: String, column: String, cutoff: String,
      dryRun: Boolean = true): RetentionReport = {
    val parts = partitions(dir, column)
    val (drop, keep) = parts.partition { case (v, _) => v < cutoff }
    val dropped = drop.toSeq.sortBy(_._1).map { case (v, d) =>
      val (files, bytes) = Dfs.contentSummary(d)
      PartitionInfo(v, files, bytes)
    }
    if (!dryRun) drop.values.foreach(Dfs.deleteTreeStrict)
    RetentionReport(column, cutoff, dropped, keep.keys.toSeq.sorted, deleted = !dryRun)
  }
}
