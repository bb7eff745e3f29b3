package graft.engine

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded k-smallest / k-largest VALUE MULTISET per group as a typed
  * `Aggregator` — the hidden-state builder for
  * [[graft.sink.MaterializedAgg]]'s extremum buffers (IVM over MIN/MAX).
  *
  * A maintained MIN is fragile under deletes: the delta stream says a value
  * LEFT the group, but whether the stored minimum survives depends on
  * multiplicity the min alone cannot answer — so a min-only view must
  * rescan the source whenever any removal ties the stored extremum.
  * Keeping the k smallest values WITH multiplicity absorbs removals
  * exactly until k of them hit one group's buffer in a single refresh
  * (the classic bounded-heap IVM trick); the rescan becomes the rare
  * fallback instead of the common case.
  *
  * Contract: nulls are skipped (a null never participates in MIN/MAX);
  * output is sorted ascending for `bottom = true`, descending otherwise,
  * at most k values, duplicates preserved. State is O(k) per group at
  * every stage — partial aggregation bounds shuffle volume to O(groups·k)
  * regardless of group size, same as [[TopKAggregator]].
  */
final class BoundedExtremesAgg(k: Int, bottom: Boolean)
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  /** Priority order: a before b. */
  @inline private def before(a: Long, b: Long): Boolean =
    if (bottom) a < b else a > b

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: java.lang.Long): Array[Long] =
    if (v == null) buf
    else {
      val x = v.longValue()
      if (buf.length < k) sortedInsert(buf, x)
      else if (before(x, buf(k - 1))) sortedInsert(buf.dropRight(1), x)
      else buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val all = a ++ b
    val sorted =
      if (bottom) all.sorted
      else all.sorted(Ordering[Long].reverse)
    sorted.take(k)
  }

  private def sortedInsert(buf: Array[Long], x: Long): Array[Long] = {
    val out = new Array[Long](buf.length + 1)
    var i = 0
    while (i < buf.length && !before(x, buf(i))) { out(i) = buf(i); i += 1 }
    out(i) = x
    System.arraycopy(buf, i, out, i + 1, buf.length - i)
    out
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object BoundedExtremesAgg {

  // one UDAF per (k, direction), built once per JVM: udaf() derives
  // encoders reflectively — refresh loops should pay that once
  private val cache =
    scala.collection.concurrent.TrieMap
      .empty[(Int, Boolean), org.apache.spark.sql.expressions.UserDefinedFunction]

  private def fn(k: Int, bottom: Boolean) =
    cache.getOrElseUpdate((k, bottom),
      udaf(new BoundedExtremesAgg(k, bottom), ExpressionEncoder[java.lang.Long]()))

  /** The k smallest non-null values of `c` per group, ascending. */
  def bottomK(c: Column, k: Int): Column = fn(k, bottom = true)(c)

  /** The k largest non-null values of `c` per group, descending. */
  def topK(c: Column, k: Int): Column = fn(k, bottom = false)(c)
}
