package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Single-pass MinHash signature as a typed `Aggregator` (the engine's UDAF
  * surface, SURVEY §2.3). One 16-long buffer per document replaces the
  * explode-by-16 row blow-up: partial aggregation reduces every partition to
  * one buffer per doc before the shuffle, so shuffle volume is O(docs), not
  * O(tokens×hashes) — the property that matters at 100 TB.
  *
  * Hash family identical to [[Dedup]] (same constants), so signatures are
  * interchangeable with the compositional formulation.
  */
final class MinHashAggregator(numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], code: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = (Dedup.hashA(i) * code + Dedup.hashB(i)) % Dedup.P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {

  // one udaf per width per JVM: encoder derivation is reflective, repeated
  // callers (bench timed runs) should not re-pay it
  private val perWidth = scala.collection.concurrent.TrieMap
    .empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  def column(numHashes: Int = Dedup.NumHashes): Column =
    perWidth.getOrElseUpdate(numHashes,
      udaf(new MinHashAggregator(numHashes), ExpressionEncoder[Long]())).apply(col("code"))

  /** Drop-in replacement for Dedup.minhashSignatures: same (doc_id, hi, mh)
    * shape, computed in one aggregation pass.
    */
  def signatures(tokenCodes: DataFrame, numHashes: Int = Dedup.NumHashes): DataFrame =
    tokenCodes.groupBy("doc_id")
      .agg(column(numHashes).as("sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("hi", "mh")))
}
