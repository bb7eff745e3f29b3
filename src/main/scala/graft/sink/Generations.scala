package graft.sink

import org.apache.hadoop.fs.{Path => HPath}
import graft.engine.Dfs

/** Shared generation machinery for the batch-partial store family
  * (vector index, text index, HLL sketches, heavy hitters): maintenance
  * rewrites (compaction, reclustering) build a complete NEW state under a
  * not-yet-live `gen=<g+1>/` prefix and flip readers with ONE manifest
  * publish through the commit-lock seam — no rename swap, no reader
  * window, partials invisible until the flip. Generation 0 is each
  * store's original flat layout, so pre-generation stores read unchanged.
  */
private[graft] object Generations {

  /** The generation readers and appenders of `dir` currently bind to. */
  def liveGen(dir: String): Long =
    Dfs.list(new HPath(s"$dir/gens"))
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted.lastOption.getOrElse(0L)

  /** Clears a crashed prior attempt at generation `ng` (invisible garbage
    * — it never published).
    */
  def clearPartial(dir: String, ng: Long): Unit =
    Dfs.deleteTreeQuiet(new HPath(s"$dir/gen=$ng"))

  /** The atomic flip: publish generation `ng`'s manifest. Errors on a lost
    * race — maintenance is single-writer per store; a concurrent
    * maintainer's result should be re-examined, not overwritten.
    */
  def publish(dir: String, ng: Long, what: String): Unit = {
    Dfs.mkdirs(new HPath(s"$dir/gens"))
    val tmp = new HPath(s"$dir/gens", s".tmp-$ng")
    Dfs.writeUtf8(tmp, s"gen=$ng\n")
    val won = graft.engine.CommitLock.current.publishOntoAbsent(
      tmp, new HPath(s"$dir/gens", f"v$ng%08d.manifest"))
    if (!won) {
      Dfs.delete(tmp)
      sys.error(s"$what lost the generation-$ng publish race at $dir — " +
        "another maintainer ran concurrently; re-run against its result")
    }
  }

  /** Reclaims superseded (non-live) generations older than `minAgeMs`:
    * `flatSubs` are the store's gen-0 flat directories (collected once a
    * migration superseded them), plus every `gen=<g>` root below the live
    * generation. The age guard covers in-flight readers around a flip.
    * Returns the number of generations reclaimed.
    */
  def vacuum(dir: String, flatSubs: Seq[String], minAgeMs: Long): Int = {
    val live = liveGen(dir)
    val now = System.currentTimeMillis()
    // absent = vacuously cold (a half-reclaimed flat layout must not block
    // the rest forever)
    def cold(p: HPath): Boolean =
      !Dfs.exists(p) || Dfs.list(p).forall(st =>
        now - st.getModificationTime >= minAgeMs)
    var n = 0
    if (live > 0L && flatSubs.exists(s => Dfs.exists(new HPath(s"$dir/$s")))) {
      if (flatSubs.forall(s => cold(new HPath(s"$dir/$s")))) {
        flatSubs.foreach(s => Dfs.deleteTreeQuiet(new HPath(s"$dir/$s")))
        n += 1
      }
    }
    Dfs.list(new HPath(dir))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen="))
      .filter(st => st.getPath.getName.stripPrefix("gen=").toLong < live)
      .filter(st => now - st.getModificationTime >= minAgeMs)
      .foreach { st => Dfs.deleteTreeQuiet(st.getPath); n += 1 }
    n
  }
}
