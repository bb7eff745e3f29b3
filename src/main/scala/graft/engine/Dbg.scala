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
