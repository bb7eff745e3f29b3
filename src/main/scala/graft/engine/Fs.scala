package graft.engine

import java.io.File

/** The one recursive-delete helper (previously five near-identical copies,
  * each silently re-deciding error policy). [[deleteTree]] is best-effort
  * — right for tmp/scratch cleanup — and reports whether everything went;
  * [[deleteTreeStrict]] throws naming the survivor, for callers whose
  * RETURN VALUE claims the data is gone (retention, vacuum): silently
  * keeping bytes a report says were deleted is the silent-cap failure mode
  * this codebase bans.
  */
object Fs {

  /** Depth-first delete; true iff nothing remains. */
  def deleteTree(f: File): Boolean = {
    val childrenOk =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[File]).forall(deleteTree)
      else true
    childrenOk && (!f.exists() || f.delete())
  }

  /** [[deleteTree]] that refuses to lie: throws if anything survives. */
  def deleteTreeStrict(f: File): Unit = {
    deleteTree(f)
    if (f.exists())
      sys.error(s"failed to delete ${f.getPath} — data reported dropped is still on disk")
  }

  private val reclaimHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** ONE shutdown hook per path, however many times a builder re-runs in
    * the process: best-effort [[deleteTree]] at JVM exit. The single copy
    * of the guard-set + `sys.addShutdownHook` pattern tmp-dir builders
    * (Tables.ensureTmpStore, q61f) previously each re-implemented.
    */
  def reclaimAtExit(path: String): Unit =
    if (reclaimHooked.add(path)) {
      sys.addShutdownHook { deleteTree(new File(path)); () }
      ()
    }
}
