package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Bloom-filter join pruning — the runtime-filter pattern for joins whose
  * small side is too big to broadcast as a hash relation but whose KEY SET
  * compresses into a few megabytes of bloom bits. The big side is filtered
  * BEFORE its shuffle (or scan-side, ahead of any exchange), so rows that
  * cannot match never pay shuffle I/O; the exact join afterwards removes
  * the bloom's false positives, so results are identical to the plain join
  * (blooms have no false negatives).
  *
  * Composition is the same pair of Catalyst expressions Spark's own
  * `InjectRuntimeFilter` uses (`BloomFilterAggregate`,
  * `BloomFilterMightContain`), driven explicitly: Spark injects them only
  * under conf thresholds and with a selective filter on the creation side;
  * a pipeline author often KNOWS the dim side is selective (e.g. "part
  * numbers recalled this week") and wants the prune unconditionally.
  *
  * Scale: the bloom build is a distributed aggregation (per-partition
  * blooms OR-merged); exactly one row (the serialized filter) reaches the
  * driver — for the default 1M expected items that is ~1.2 MB, re-shipped
  * to executors as a plan literal. The driver never sees the keys
  * themselves.
  */
object BloomPrune {

  /** `big` minus the rows whose `bigKey` is provably absent from
    * `small`'s `smallKey` set. An empty small side yields an empty result
    * (the aggregate returns no bloom to probe). The two key columns must
    * share a data type — the bloom stores xxhash64 of the key, and INT
    * and BIGINT (or INT and STRING) hash differently, exactly like any
    * hash-join key contract.
    */
  def semiFilter(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      expectedItems: Long = 1L << 20): DataFrame = {
    GraftFunctions.register(big.sparkSession)
    val bytes = small
      .agg(call_function("bloom_build", smallKey, lit(expectedItems)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    if (bytes == null) big.filter(lit(false))
    else big.filter(call_function("bloom_might_contain", lit(bytes), bigKey))
  }

  /** Inner equi-join with the big side bloom-pruned first. Row-identical to
    * `big.join(small, big(bigKey) === small(smallKey))` by the no-false-
    * negative property; cheaper whenever the key set is selective.
    */
  def prunedJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 1L << 20): DataFrame = {
    val pruned = semiFilter(big, col(bigKey), small, col(smallKey), expectedItems)
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }
}
