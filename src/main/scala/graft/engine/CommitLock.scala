package graft.engine

import org.apache.hadoop.fs.Path

/** The commit-coordination seam of every manifest publish (snapshot table
  * commits, catalog transactions): put-if-absent of one small, fully
  * written metadata file. This is the Delta Lake `LogStore` pattern — the
  * table format's correctness reduces to exactly this primitive, so making
  * it pluggable is what lets the same protocol run on filesystems with
  * very different atomicity guarantees:
  *
  *   - HDFS: rename-with-fail-if-exists is one atomic namenode op —
  *     [[HadoopRenameCommitLock]] (the default) uses it directly.
  *   - Object stores (s3a): "rename" is copy-then-delete with NO
  *     fail-if-exists — racing through it loses commits silently.
  *     [[ObjectStoreCommitLock]] never calls rename at all: it builds
  *     put-if-absent from existence-check + atomic PUT under an exclusive
  *     [[CommitCoordinator]] lease.
  *
  * Contract (all implementations): returns true iff `src`'s content became
  * `dst` AND no other committer owned `dst` first; on false, `dst` is some
  * other committer's content and `src` is left in place for the caller to
  * clean up. `src` must be a fully written metadata-sized FILE.
  */
trait CommitLock {
  def publishOntoAbsent(src: Path, dst: Path): Boolean
}

/** Default: delegate to [[Dfs.renameOntoAbsent]] (FileContext rename with
  * `Options.Rename.NONE`) — atomic on HDFS, striped-JVM-lock-assisted on
  * the local filesystem. See that method's scaladoc for the per-filesystem
  * atomicity grading.
  */
object HadoopRenameCommitLock extends CommitLock {
  override def publishOntoAbsent(src: Path, dst: Path): Boolean =
    Dfs.renameOntoAbsent(src, dst)
}

/** Mutual exclusion for commit slots whose filesystem cannot provide it —
  * the seam a MULTI-driver object-store deployment fills with an external
  * service (a DynamoDB-style lock table, ZooKeeper, a database row lock).
  * `withExclusive` must guarantee at most one holder per key at a time
  * across every process that can commit to the same table.
  */
trait CommitCoordinator {
  def withExclusive[A](key: String)(f: => A): A
}

/** Single-driver coordination: a JVM-wide striped mutex. Exactly the
  * guarantee of Delta's `S3SingleDriverLogStore` — correct whenever all
  * committers of a table share one JVM (one streaming driver, tests),
  * which is the common deployment; concurrent drivers on the SAME table
  * need an external [[CommitCoordinator]] instead.
  */
object InJvmCoordinator extends CommitCoordinator {
  private val stripes = Array.fill(64)(new Object)
  override def withExclusive[A](key: String)(f: => A): A =
    stripes(math.floorMod(key.hashCode, stripes.length)).synchronized(f)
}

/** Cross-PROCESS coordination on a shared POSIX filesystem: an exclusive
  * `java.nio.channels.FileLock` on a per-key lock file under `lockDir` —
  * the OS arbitrates between processes, which closes the cross-process
  * check-then-act window the in-JVM coordinator cannot (the `file:`/NFS
  * caveat in [[Dfs.renameOntoAbsent]]'s scaladoc). Same-JVM overlap is
  * prevented by an inner striped mutex BEFORE the file lock is taken
  * (the JVM throws OverlappingFileLockException otherwise). Lock files are
  * tiny and reused per key hash; they are never deleted (deleting a lock
  * file another process holds open reintroduces the race).
  *
  * Use when several PROCESSES on one host (or an NFS mount with working
  * locks) commit to the same table; clusters use HDFS rename or an
  * external service instead.
  */
final class FileLockCoordinator(lockDir: String) extends CommitCoordinator {
  private val stripes = Array.fill(64)(new Object)
  new java.io.File(lockDir).mkdirs()
  override def withExclusive[A](key: String)(f: => A): A = {
    val stripe = math.floorMod(key.hashCode, stripes.length)
    stripes(stripe).synchronized {
      val lockFile = new java.io.File(lockDir, f"k$stripe%02d.lock")
      val ch = java.nio.channels.FileChannel.open(lockFile.toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock() // blocks until the other PROCESS releases
        try f finally { lock.release(); () }
      } finally ch.close()
    }
  }
}

/** Put-if-absent for filesystems WITHOUT atomic fail-if-exists rename
  * (s3a and friends, where rename is copy-then-delete): under the
  * coordinator's exclusive lease on the destination, check absence, then
  * publish with a plain create — a single PUT, which object stores make
  * atomic (all-or-nothing visibility) even though their rename is not —
  * then drop the scratch source. Rename atomicity is never relied on
  * anywhere in the path.
  *
  * Refuses loudly instead of corrupting: a directory or oversized source
  * is a protocol violation (the commit protocol only ever publishes small
  * manifest files), not a lost race.
  */
final class ObjectStoreCommitLock(
    coordinator: CommitCoordinator = InJvmCoordinator) extends CommitLock {
  override def publishOntoAbsent(src: Path, dst: Path): Boolean = {
    val fsrc = Dfs.fs(src)
    require(fsrc.exists(src) && fsrc.getFileStatus(src).isFile,
      s"commit publish source $src must be an existing FILE — the manifest " +
        "protocol never publishes directories through the commit lock")
    coordinator.withExclusive(dst.toString) {
      if (Dfs.exists(dst)) false // lost: dst is another committer's manifest
      else {
        val body = Dfs.readUtf8(src) // metadata-sized by readUtf8's own guard
        // a real store's PUT is atomically visible; the local-FS emulation
        // must be too — a direct create+write let concurrent readers (who
        // take no lock) observe a PARTIAL manifest body (seen as a
        // "manifest lacks nBuckets" flake in the racing-writers spec), a
        // failure mode the emulated store cannot actually produce. The
        // stage name keeps the sink's `.tmp-` prefix so a crash between
        // write and rename leaves a file vacuum's aged-out sweep collects
        val staged = new Path(dst.getParent,
          s".tmp-put-${java.util.UUID.randomUUID()}")
        Dfs.writeUtf8(staged, body)
        Dfs.rename(staged, dst)
        // scratch cleanup is best-effort; the slot is already won
        try Dfs.delete(src) catch { case _: java.io.IOException => () }
        true
      }
    }
  }
}

object CommitLock {
  @volatile private var impl: CommitLock = HadoopRenameCommitLock

  /** Deployment-conf selection: `spark.graft.commit.lock` = `rename`
    * (default, HDFS-style) or `objectstore` (put-if-absent under the in-JVM
    * coordinator — the s3a single-driver deployment). Called by
    * [[GraftSession.configure]]/`getOrCreate`, so the same conf that points
    * tables at an object store can also pick the matching commit protocol.
    */
  def fromConf(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.getOption("spark.graft.commit.lock").foreach {
      case "rename"      => set(HadoopRenameCommitLock); ()
      case "objectstore" => set(new ObjectStoreCommitLock()); ()
      case other => sys.error(
        s"spark.graft.commit.lock must be rename|objectstore, got '$other'")
    }

  /** The active lock implementation for manifest publishes. */
  def current: CommitLock = impl

  /** Swap the publish implementation process-wide (a deployment choice,
    * made once at startup next to the filesystem configuration — e.g.
    * `ObjectStoreCommitLock` when tables live on s3a). Returns the
    * previous implementation so tests can restore it.
    */
  def set(lock: CommitLock): CommitLock = {
    val prev = impl
    impl = lock
    prev
  }

  /** Run `f` under `lock`, restoring the previous implementation after —
    * the test-matrix hook.
    */
  def withLock[A](lock: CommitLock)(f: => A): A = {
    val prev = set(lock)
    try f finally { set(prev); () }
  }
}
