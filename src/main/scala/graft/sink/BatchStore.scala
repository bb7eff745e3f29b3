package graft.sink

import org.apache.hadoop.fs.Path
import graft.engine.Dfs

/** Shared commit-visibility contract for per-batch partial stores
  * ([[HllSketchStore]], [[HeavyHitterStore]]): a batch directory exists
  * once its write COMMITTED (Spark's `_SUCCESS` marker landed). A crash
  * mid-append leaves a partial `batch=<id>` without the marker — merging
  * it would silently under-count, so readers treat it as not-yet-committed
  * (replaying the append overwrites and commits it). Listing goes through
  * the Hadoop FileSystem API ([[Dfs]]), so a store dir may be local disk,
  * `file:`-qualified, or object storage — one copy, every store at once.
  */
private[graft] object BatchStore {
  def committedBatchPaths(dir: String): Seq[String] =
    committedBatchDirs(dir).map(_._2)

  /** The batch id encoded in a `…/batch=<id>` dir path. */
  def idOf(path: String): Long =
    path.substring(path.lastIndexOf("batch=") + "batch=".length).toLong

  /** Committed batch dirs with their parsed ids, id-ascending — the id is
    * the watermark/straggler currency of [[Generations.visibleBatches]].
    */
  def committedBatchDirs(dir: String): Seq[(Long, String)] = {
    val d = new Path(dir)
    if (!Dfs.exists(d)) return Seq.empty
    val fs = Dfs.fs(d)
    Dfs.list(d)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(s => s.getPath.getName.stripPrefix("batch=").toLong -> s.getPath.toString)
      .sortBy(_._1)
  }
}
