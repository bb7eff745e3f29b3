package graft

/** Bench-only scale probe for the BSP graph family (SURVEY §8): does
  * per-iteration wall time stay FLAT as iterations accumulate (the O(1)-plan
  * claim the lineage rebase buys), and how does one iteration's cost move
  * when the edge set grows 8×? The per-round suite (q96/q96e) runs at sf0.1
  * where iteration latency, not data volume, dominates — this main
  * synthesizes deterministic edge sets far past that and measures the two
  * claims directly.
  *
  * Emits one JSON line:
  *   {"edges":{"<E>":{"iters":{"2":sec,...},"per_round_sec":...}},...}
  * where per_round_sec is the slope between the largest two iteration
  * counts — the steady-state cost of one more BSP round. Flat-plan check:
  * sec(16)−sec(8) ≈ sec(8)−sec(4) (no per-round growth as lineage
  * accumulates). Scale check: per_round_sec at 8E vs E.
  *
  * Deterministic synthesis (no RNG): edge k of N nodes is
  * (k mod N) → (k·2654435761 mod N) — a fixed-degree pseudo-random graph,
  * identical across runs and engines.
  */
object BenchGraphScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate()
    import org.apache.spark.sql.functions._
    def edges(nEdges: Long) = {
      val n = math.max(2L, nEdges / 8L) // avg degree ~16 after undirection
      spark.range(nEdges).select(
        pmod(col("id"), lit(n)).as("i"),
        pmod(col("id") * 2654435761L, lit(n)).as("j"))
        .filter(col("i") =!= col("j"))
    }
    val base = args.headOption.map(_.toLong).getOrElse(200000L)
    val itersList = Seq(2, 4, 8, 16)
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val out = Seq(base, base * 8L).map { e =>
      val pairs = edges(e)
      // warm-up: codegen + the persist both timed runs will rebuild (each
      // pageRank call persists and unpersists its own edge frame)
      graft.engine.Graph.pageRank(pairs, 1)(_.count())
      val times = itersList.map { k =>
        val t0 = System.nanoTime()
        graft.engine.Graph.pageRank(pairs, k)(_.count())
        k -> (System.nanoTime() - t0) / 1e9
      }
      val m = times.toMap
      val perRound = (m(16) - m(8)) / 8.0
      val flatness = (m(16) - m(8)) / math.max(1e-9, 2.0 * (m(8) - m(4)))
      s""""$e":{${times.map { case (k, s) => s""""$k":${num(s)}""" }.mkString(",")},"per_round_sec":${num(perRound)},"flatness":${num(flatness)}}"""
    }
    println(s"""{"edges":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
