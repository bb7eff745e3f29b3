package graft.sink

import java.io.File

/** Partition-lifecycle maintenance for directory-partitioned tables (the
  * `partitionBy("dt")` layout every 100 TB event table lands in): retention
  * enforcement is a DIRECTORY operation — dropping a day deletes one
  * `dt=<day>` subtree, never opens a data file, and costs O(partitions
  * dropped) regardless of table volume. The complement of planning-time
  * partition pruning (reads skip old days; retention removes them).
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

  private def walk(f: File): Seq[File] =
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
    else Seq(f)

  /** The table's partitions for `column`: encoded value → directory. */
  def partitions(dir: String, column: String): Map[String, File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(s"$column="))
      .map(f => f.getName.stripPrefix(s"$column=") -> f)
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
      val files = walk(d)
      PartitionInfo(v, files.size.toLong, files.map(_.length()).sum)
    }
    if (!dryRun) drop.values.foreach(graft.engine.Fs.deleteTreeStrict)
    RetentionReport(column, cutoff, dropped, keep.keys.toSeq.sorted, deleted = !dryRun)
  }
}
