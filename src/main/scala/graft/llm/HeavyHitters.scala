package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the heavy-
  * hitters operator for vocabularies too large to group exactly: an exact
  * `groupBy(token).count` over 100 TB of text shuffles EVERY distinct token
  * (a long Zipf tail of billions of near-singletons) just to read off the
  * few thousand heavy items. The sketch holds at most `k` counters per
  * partial aggregate, so the shuffle carries one k-entry map per partition
  * instead of the tail, and partial aggregation stays map-side-combinable.
  *
  * Guarantees (standard Misra–Gries, preserved by the counter-wise merge +
  * rescue-decrement): for stream length n, every item with true frequency
  * > n/(k+1) is present in the summary, and each reported count
  * underestimates the true count by at most n/(k+1). The summary is a
  * CANDIDATE set — an exact second pass over only those candidates (a
  * semi-join, tiny) turns it into exact top-m counts; `topExact` below is
  * that two-pass composition.
  *
  * Result contents are deterministic up to the error bound; counter VALUES
  * depend on partition merge order (like any sketch), so this surface is
  * ScalaTest-covered against its guarantees rather than oracle-hashed.
  */
final class HeavyHittersAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "need at least one counter")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < k => buf.updated(item, 1L)
      case None => // decrement-all step: shrink every counter, drop zeros
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  /** Counter-wise sum, then rescue the summary back to k entries by
    * subtracting the (k+1)-th largest count from everything (the merge that
    * keeps the n/(k+1) error bound additive across partitions).
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (item, c)) =>
      m.updated(item, m.getOrElse(item, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      combined.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {

  // one udaf per k per JVM (same rule as TopKAggregator.perK): the
  // reflective encoder derivation is paid once, not per query
  private val perK = scala.collection.concurrent.TrieMap
    .empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  def column(k: Int, itemCol: Column): Column =
    perK.getOrElseUpdate(k,
      udaf(new HeavyHittersAggregator(k), ExpressionEncoder[String]())).apply(itemCol)

  /** The k-counter candidate summary of `itemCol` as (item, est) rows. */
  def sketch(df: DataFrame, itemCol: Column, k: Int): DataFrame =
    df.agg(column(k, itemCol).as("hh"))
      .select(explode(col("hh")).as(Seq("item", "est")))

  /** Exact top-m frequent items via the two-pass shape: sketch → exact
    * recount of ONLY the candidates (broadcast semi-join, no tail shuffle)
    * → top-m. Exact whenever m-th true frequency > n/(k+1) — pick k ≫ m
    * (the ScalaTest pins a case where the single-pass sketch alone would
    * misrank and the recount corrects it).
    */
  def topExact(df: DataFrame, itemCol: Column, m: Int, k: Int): DataFrame = {
    val candidates = sketch(df, itemCol, k).select(col("item"))
    df.select(itemCol.as("item"))
      .join(broadcast(candidates), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(m)
  }
}
