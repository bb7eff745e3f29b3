package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem access for STORE directories (batch-partial stores,
  * retention, anything whose `dir` may one day be `hdfs://` or `s3a://`)
  * through the Hadoop FileSystem API instead of `java.io.File`. A path's
  * scheme picks its filesystem via the active Spark session's Hadoop
  * configuration, so the same store code runs against local disk in tests
  * and object storage on a cluster — the `fs.s3a.*` / `fs.defaultFS`
  * settings the session carries apply unchanged.
  *
  * [[Fs]] (the `java.io.File` twin) stays for genuinely driver-local
  * scratch (bench/verify temp dirs); anything that stores DATA a cluster
  * job reads back goes through here.
  */
object Dfs {

  /** The active session's Hadoop configuration when one exists (its
    * `fs.*` credentials and scheme registrations apply), else a fresh
    * default configuration — path resolution still works for `file:` and
    * scheme-less local paths.
    */
  def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(p: Path): Boolean = fs(p).exists(p)

  /** Immediate children of `dir` (empty if it does not exist — a store
    * that was never appended to is empty, not an error).
    */
  def list(dir: Path): Seq[FileStatus] = {
    val f = fs(dir)
    if (!f.exists(dir)) Seq.empty else f.listStatus(dir).toSeq
  }

  /** Recursive delete that refuses to lie — the [[Fs.deleteTreeStrict]]
    * contract on any filesystem: throws if bytes a caller is about to
    * report gone still exist afterwards.
    */
  def deleteTreeStrict(p: Path): Unit = {
    val f = fs(p)
    if (f.exists(p)) f.delete(p, true)
    if (f.exists(p))
      sys.error(s"failed to delete $p — data reported dropped is still on disk")
  }

  /** (file count, total bytes) under `p` — one namenode/listing call via
    * ContentSummary, never a client-side tree walk over data files.
    */
  def contentSummary(p: Path): (Long, Long) = {
    val s = fs(p).getContentSummary(p)
    (s.getFileCount, s.getLength)
  }

  /** Rename that refuses to lie: the Hadoop API signals failure by
    * returning false (target exists, cross-filesystem move, permissions) —
    * callers doing a directory swap must know it did not happen.
    */
  def rename(src: Path, dst: Path): Unit =
    if (!fs(src).rename(src, dst))
      sys.error(s"rename $src -> $dst failed")
}
