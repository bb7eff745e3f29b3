package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact streaming deduplication with BOUNDED state (SURVEY §3.5).
  *
  * `dropDuplicates(keys)` on a stream keeps every key it has ever seen
  * unless the event-time column is itself part of the dedup key — at
  * 100 TB feeds the state store grows without bound. `withinWatermark`
  * uses `dropDuplicatesWithinWatermark`, which evicts a key's state once
  * the watermark passes its event time: memory is bounded by
  * (arrival rate × delay), under the contract that a duplicate arrives
  * within `delay` of the original — the actual failure mode of
  * at-least-once CDC/event feeds, whose duplicates are reconnect-local.
  */
object StreamingDedup {

  def withinWatermark(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Streaming NEAR-dup suppression over an embedding column: exact dedup
    * on the random-hyperplane LSH bucket key — the first vector landing in
    * a bucket is kept as its representative, later cosine-similar arrivals
    * are dropped, and state stays watermark-bounded like any
    * `dropDuplicatesWithinWatermark`. The same bucket→candidate contract as
    * the batch [[graft.llm.Dedup.embeddingNearDupLsh]] (recall tunable via
    * nPlanes), trading its exact-cosine verify join for an O(1) per-row
    * streaming decision — the batch pass stays the precision backstop.
    */
  def nearDupLshWithinWatermark(df: DataFrame, embCol: String, dim: Int,
      nPlanes: Int, tsCol: String, delay: String): DataFrame =
    df.withColumn("__bucket",
        graft.llm.Similarity.lshBucket(org.apache.spark.sql.functions.col(embCol), dim, nPlanes))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__bucket"))
      .drop("__bucket")
}
