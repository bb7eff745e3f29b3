package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range join — the scale path for interval predicates like
  * `r.ts > l.ts AND r.ts <= l.ts + W`.
  *
  * A plain equi-join on the key with the range as a post-filter materializes
  * EVERY within-key event pair before filtering — O(pairs-per-key), which at
  * dense keys dwarfs the surviving matches. Binning quantizes time into
  * fixed `binUs` buckets: each left row joins only the handful of bins its
  * window `(lts, lts+W]` overlaps (⌈W/binUs⌉+1 bins), each right row sits in
  * exactly one bin, and the join becomes a pure equi-join on
  * (key, bin) with the exact range predicate re-checked on the survivors.
  * Each qualifying pair meets in exactly one bin (the right row's), so no
  * dedup pass is needed.
  */
object RangeJoin {

  /** Inner range join: rows of `right` with the same `key` and
    * `rightUs ∈ (leftUs, leftUs + windowUs]` (epoch-microsecond longs).
    * `binUs` defaults to the window width — one or two bins per left row.
    */
  def binned(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftUs: String, rightUs: String,
      windowUs: Long,
      binUs: Long = 0L): DataFrame = {
    val w = if (binUs > 0) binUs else windowUs
    val lo = floor((col(leftUs) + 1) / w).cast("long")
    val hi = floor((col(leftUs) + windowUs) / w).cast("long")
    val l = left.withColumn("__bin", explode(sequence(lo, hi)))
    val r = right.withColumn("__bin", floor(col(rightUs) / w).cast("long"))
    l.join(r,
        l(leftKey) === r(rightKey) && l("__bin") === r("__bin") &&
          r(rightUs) > l(leftUs) && r(rightUs) <= l(leftUs) + windowUs)
      .drop(l("__bin")).drop(r("__bin"))
  }

  /** Two-sided INTERVAL overlap join: pairs with the same key whose closed
    * intervals `[leftStart, leftEnd]` and `[rightStart, rightEnd]` overlap
    * (`max(starts) <= min(ends)`). Both sides explode to every bin their
    * interval touches and the join is an equi-join on (key, bin); a
    * qualifying pair meets in every SHARED bin, so it is counted only in
    * the bin holding the overlap's start (`floor(max(starts)/bin)` — by
    * definition inside both intervals): exact, no dedup pass, no
    * duplicates. Explode factor per row is interval-length/binWidth + 1 —
    * bounded when intervals are (the caller picks `binWidth` near the
    * typical interval length; sub-linear blowup vs the all-pairs theta
    * join a planner would otherwise run).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin", explode(sequence(
      floor(col(leftStart) / binWidth).cast("long"),
      floor(col(leftEnd) / binWidth).cast("long"))))
    val r = right.withColumn("__bin", explode(sequence(
      floor(col(rightStart) / binWidth).cast("long"),
      floor(col(rightEnd) / binWidth).cast("long"))))
    l.join(r,
        l(leftKey) === r(rightKey) && l("__bin") === r("__bin") &&
          greatest(l(leftStart), r(rightStart)) <= least(l(leftEnd), r(rightEnd)) &&
          floor(greatest(l(leftStart), r(rightStart)) / binWidth).cast("long") === l("__bin"))
      .drop(l("__bin")).drop(r("__bin"))
  }
}
