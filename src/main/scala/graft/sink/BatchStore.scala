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
  def committedBatchPaths(dir: String): Seq[String] = {
    val d = new Path(dir)
    val fs = Dfs.fs(d)
    Dfs.list(d)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.toString).sorted
  }
}
