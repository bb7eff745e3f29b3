package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of the batch range join
  * (engine.RangeJoin / q18): rows of the same key joined when the right
  * event falls within `(left.ts, left.ts + window]`.
  *
  * What makes this safe to run forever: BOTH sides carry watermarks and the
  * join condition bounds event time in BOTH directions, so Spark can derive
  * a state-eviction horizon per side instead of buffering each stream
  * indefinitely — the unbounded-state hazard of a naive stream-stream join.
  * (Structured Streaming rejects an inner stream-stream join with no
  * time bound only at the analysis level for OUTER joins; an inner join
  * without the bound silently keeps all state.)
  */
object StreamJoin {

  /** Inner interval join of two streaming frames.
    *
    * @param window SQL interval literal body, e.g. "1 HOUR"
    * @param watermarkDelay how late events may arrive, e.g. "10 minutes"
    */
  def interval(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      window: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val cond: Column = col(leftKey) === col(rightKey) &&
      col(rightTs) > col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window")
    l.join(r, cond)
  }
}
