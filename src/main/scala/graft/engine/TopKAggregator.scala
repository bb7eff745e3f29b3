package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state top-k per group as a typed `Aggregator` — the scale path
  * for the q42 window formulation. `row_number() OVER (PARTITION BY g ORDER
  * BY v)` shuffles EVERY row of every group and sorts each partition; this
  * aggregator keeps at most k entries per group in its buffer, so partial
  * aggregation reduces each map task to ≤ k rows per group before the
  * shuffle — shuffle volume O(groups·k) independent of group size, the same
  * property [[graft.llm.MinHashAggregator]] exploits. Exactness is
  * unconditional (every element is observed; only non-top-k state is
  * discarded), unlike sketch-based heavy hitters.
  *
  * Entries are (value, tie) longs ranked by (value DESC, tie ASC) — callers
  * encode their sort key exactly (e.g. prices as cents) and the tie-break
  * id as the payload.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")

  /** (value DESC, tie ASC): a before b. */
  @inline private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(buf: Array[(Long, Long)], e: (Long, Long)): Array[(Long, Long)] =
    if (buf.length < k) (buf :+ e).sortWith(better)
    else if (better(e, buf(k - 1))) { buf(k - 1) = e; buf.sortWith(better) }
    else buf

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Array[(Long, Long)]): Seq[(Long, Long)] = r.toSeq

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKAggregator {

  /** One UDAF per k, built once per JVM: `udaf(...)` derives three
    * ExpressionEncoders reflectively — repeated callers (bench timed runs)
    * should pay that derivation once, not per query.
    */
  private val perK =
    scala.collection.concurrent.TrieMap
      .empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Top-k rows per group: one row per kept (value, tie) entry, ranked by
    * (value DESC, tie ASC). Output columns: the group column, `value`,
    * `tie`.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, value: Column, tie: Column,
      k: Int): DataFrame = {
    val agg = perK.getOrElseUpdate(k,
      udaf(new TopKAggregator(k), ExpressionEncoder[(Long, Long)]()))
    df.groupBy(col(groupCol))
      .agg(agg(value, tie).as("__top"))
      .select(col(groupCol), explode(col("__top")).as("__e"))
      .select(col(groupCol), col("__e._1").as("value"), col("__e._2").as("tie"))
  }
}
