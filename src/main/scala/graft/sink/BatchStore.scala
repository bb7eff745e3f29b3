package graft.sink

/** Shared commit-visibility contract for per-batch partial stores
  * ([[HllSketchStore]], [[HeavyHitterStore]]): a batch directory exists
  * once its write COMMITTED (Spark's `_SUCCESS` marker landed). A crash
  * mid-append leaves a partial `batch=<id>` without the marker — merging
  * it would silently under-count, so readers treat it as not-yet-committed
  * (replaying the append overwrites and commits it). One copy, so a future
  * move to the Hadoop FileSystem API (non-local storage) changes every
  * store at once.
  */
private[sink] object BatchStore {
  def committedBatchPaths(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .filter(f => new java.io.File(f, "_SUCCESS").exists())
      .map(_.getPath).sorted
  }
}
