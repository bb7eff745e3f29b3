package graft.engine

/** Opt-in stage timing behind a system-property knob: when `prop` is set,
  * each wrapped stage prints `prefix tag seconds` to stderr; unset, the
  * wrapper is a plain pass-through. The commit / catalog / IVM
  * `graft.*.debug` knobs all share this exact shape — one definition
  * keeps the knob names and output format from drifting apart (the
  * pre-consolidation copies had already diverged in padding and
  * precision).
  */
final class Dbg(prop: String, prefix: String) {
  def apply[A](tag: String)(f: => A): A =
    if (!sys.props.contains(prop)) f
    else {
      val t0 = System.nanoTime()
      val a = f
      System.err.println(
        f"$prefix%s $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.4f s")
      a
    }
}

/** Labels every Spark job submitted inside `f` with a protocol-phase tag
  * (guide: "label your jobs") — the UI and job-level profilers can then
  * attribute a lifecycle query's jobs to commit/IVM phases. Thread-local
  * (actions inside merges run on the caller thread); restores the caller's
  * own description on exit so labels never leak into user jobs.
  */
object JobTag {
  def apply[A](spark: org.apache.spark.sql.SparkSession, tag: String)(f: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(tag)
    try f finally sc.setJobDescription(prev)
  }
}
