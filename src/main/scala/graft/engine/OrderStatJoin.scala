package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale path for MONOTONE THETA AGGREGATES — `COUNT(*) WHERE l.v > r.v`
  * and friends — which Spark plans as a BroadcastNestedLoopJoin
  * (O(|L|·|R|) comparisons; q17 pins those semantics deliberately).
  *
  * The aggregate never needs the pairs, only their count, and `<` is
  * monotone — so the count decomposes by VALUE BINS (fixed width `binW`,
  * exact integer floor division, negative-safe):
  *
  *   - CROSS-BIN pairs: every right row in a bin strictly below a left
  *     row's bin satisfies `r.v < l.v` outright (r.v ≤ binLo−1 < binLo ≤
  *     l.v). Count = Σ_b L(b) · below(b) over the per-bin COUNT frames —
  *     a B-row join of two aggregates, where B = value-domain/binW is a
  *     layout constant, not a data size. The running `below(b)` prefix
  *     sum runs a window over those B rows (one task over B rows BY
  *     DESIGN — the frame is the bin directory, never the data).
  *   - WITHIN-BIN pairs: the exact `r.v < l.v` check on raw rows, but
  *     restricted to an EQUI-join on the bin — per-bin work is
  *     O(rows-per-bin²) worst case, bounded by the caller's bin width,
  *     and the shuffle is a hash join on the bin key, never a cartesian.
  *
  * Total = cross + within, exact. Work: two grouped passes + one
  * bin-equi join — O(n) + O(Σ_b L(b)·R(b)) instead of O(|L|·|R|); at a
  * uniform distribution the within term is |L|·|R|/B. NULL values pair
  * with nothing under any comparison and are dropped upfront on both
  * sides (same as the theta predicate's three-valued logic).
  */
object OrderStatJoin {

  /** One-row frame `cnt: bigint` = #{(l, r) : rightVal(r) < leftVal(l)},
    * both value expressions cast to long (exact integer domain).
    */
  def countLess(left: DataFrame, leftVal: Column,
      right: DataFrame, rightVal: Column, binW: Long): DataFrame = {
    require(binW > 0, "binW must be positive")
    // exact floor division, overflow-safe across the FULL long domain:
    // SQL `div` (integral — Column `/` would be double division, which
    // collapses distinct bins above 2^53) truncates toward zero, corrected
    // by one when a negative value doesn't divide evenly. The
    // (v - pmod(v, w)) div w form would underflow within w of
    // Long.MinValue and break the mapping's monotonicity right where the
    // cross-bin prefix sum depends on it.
    val binOfV: Column = expr(
      s"(v div ${binW}L) - (CASE WHEN v % ${binW}L < 0 THEN 1 ELSE 0 END)")
    val l = left.select(leftVal.cast("long").as("v"))
      .filter(col("v").isNotNull).withColumn("bin", binOfV)
    val r = right.select(rightVal.cast("long").as("v"))
      .filter(col("v").isNotNull).withColumn("bin", binOfV)

    val lBins = l.groupBy("bin").agg(count(lit(1)).as("lc"))
    val rBins = r.groupBy("bin").agg(count(lit(1)).as("rc"))
    // dense prefix over the UNION of observed bins so a left bin with no
    // right rows still sees the right-count below it; the window frame is
    // the B-row bin directory (single task over B rows by design)
    val bins = lBins.join(rBins, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("lc"), lit(0L)).as("lc"),
        coalesce(col("rc"), lit(0L)).as("rc"))
    val below = sum(col("rc")).over(
      Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1))
    val cross = bins
      .withColumn("below", coalesce(below, lit(0L)))
      .agg(coalesce(sum(col("lc") * col("below")), lit(0L)).as("cross"))
    // within-bin: exact strict check behind a bin EQUI-join
    val within = l.alias("l")
      .join(r.alias("r"), col("l.bin") === col("r.bin") &&
        col("r.v") < col("l.v"))
      .agg(count(lit(1)).as("within"))
    cross.crossJoin(broadcast(within)) // 1 row × 1 row
      .select((col("cross") + col("within")).as("cnt"))
  }
}
