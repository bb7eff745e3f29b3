package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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

  /** Left-outer interval join: like [[interval]], but a left row with no
    * right match inside the window still emits (right columns null) — once
    * the watermark proves no match can arrive. Structured Streaming REQUIRES
    * the time bound for outer stream-stream joins (without it the unmatched
    * side could never be declared final); the inner form merely hoards
    * state without it. Unmatched-row emission latency is therefore the
    * watermark delay plus the window.
    */
  def intervalOuter(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      window: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val cond: Column = col(leftKey) === col(rightKey) &&
      col(rightTs) > col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window")
    l.join(r, cond, "leftOuter")
  }

  /** One input event for the streaming as-of join (either side). */
  final case class AsOfEvent(key: Long, id: Long, ts: java.sql.Timestamp)

  private[streaming] final case class TaggedEvent(
      key: Long, id: Long, ts: java.sql.Timestamp, is_left: Boolean)

  /** Per-key buffers, (epochMs, id) pairs; lefts await watermark, rights
    * await a matching left within the lookback.
    */
  private[streaming] final case class AsOfBuffers(
      lefts: List[(Long, Long)], rights: List[(Long, Long)])

  /** One resolved left event: the latest right with `right.ts <= left.ts`
    * within the lookback, or None (left-outer as-of).
    */
  final case class AsOfMatch(key: Long, left_id: Long, left_ts: java.sql.Timestamp,
      right_id: Option[Long], right_ts: Option[java.sql.Timestamp])

  /** Streaming as-of join, event-time-correct: each left event is matched to
    * the LATEST right event of the same key with `right.ts <= left.ts` and
    * `right.ts > left.ts - lookback` — the streaming twin of the batch
    * [[graft.plans.AsOfJoin]] (left-outer flavor: unmatched lefts emit None).
    *
    * Why not interval-join-then-aggregate: "latest prior" needs a per-left
    * max over the join result — a second stateful operator whose output
    * lands after extra watermark delay. Here one `flatMapGroupsWithState`
    * holds both sides and resolves each left exactly once, when the
    * watermark passes its event time — so a right event that ARRIVES after
    * the left (but carries an earlier timestamp, within the watermark
    * delay) still wins. That out-of-order case is precisely what separates
    * an event-time as-of from a processing-time lookup.
    *
    * State is bounded on both sides: resolved lefts leave the state, and a
    * right can only match lefts with `l.ts < r.ts + lookback`, so rights at
    * or below `watermark - lookback` are unreachable and evicted each
    * invocation. An event-time timeout re-fires the group when the
    * watermark passes its oldest pending left (or last right), so quiet
    * keys drain instead of parking state forever. Ties on right.ts resolve
    * to the max right id, matching the batch operator's contract.
    */
  def asOf(left: Dataset[AsOfEvent], right: Dataset[AsOfEvent],
      lookbackMs: Long, watermarkDelay: String): Dataset[AsOfMatch] = {
    val spark = left.sparkSession
    import spark.implicits._
    val tagged = left.withColumn("is_left", lit(true))
      .unionByName(right.withColumn("is_left", lit(false)))
      .withWatermark("ts", watermarkDelay)
      .as[TaggedEvent]

    tagged.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[AsOfBuffers, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, it, state) =>
          val st = state.getOption.getOrElse(AsOfBuffers(Nil, Nil))
          val incoming = it.toList
          val wm = state.getCurrentWatermarkMs()
          val lefts = st.lefts ++ incoming.collect {
            case e if e.is_left => (e.ts.getTime, e.id)
          }
          val rights0 = st.rights ++ incoming.collect {
            case e if !e.is_left => (e.ts.getTime, e.id)
          }
          // lefts at or below the watermark are complete: no right with an
          // earlier timestamp can still arrive
          val (ready, pending) = lefts.partition(_._1 <= wm)
          val out = ready.sorted.map { case (lts, lid) =>
            val m = rights0.filter(r => r._1 <= lts && r._1 > lts - lookbackMs)
              .sorted.lastOption // latest ts, max id on ties
            AsOfMatch(key, lid, new java.sql.Timestamp(lts),
              m.map(_._2), m.map(r => new java.sql.Timestamp(r._1)))
          }
          val rights = rights0.filter(_._1 > wm - lookbackMs)
          if (pending.isEmpty && rights.isEmpty) state.remove()
          else {
            state.update(AsOfBuffers(pending, rights))
            val wake =
              if (pending.nonEmpty) pending.map(_._1).min
              else rights.map(_._1).max + lookbackMs // all rights evictable then
            state.setTimeoutTimestamp(wake)
          }
          out.iterator
      }(Encoders.product[AsOfBuffers], Encoders.product[AsOfMatch])
  }
}
