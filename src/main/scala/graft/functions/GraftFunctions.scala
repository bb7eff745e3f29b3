package graft.functions

import java.util.Collections
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Column/SQL bindings for the engine's native Catalyst expressions.
  * Registration goes through the session's FunctionRegistry and the Column
  * API through `call_function` — the public seams, so no reliance on
  * Spark-internal Column↔Expression converters.
  */
object GraftFunctions {

  // weak keys: don't pin stopped sessions (long-lived processes create many)
  private val registered = Collections.synchronizedSet(
    Collections.newSetFromMap(new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Idempotent per-session registration of all graft functions. */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "hamming", exprs => HammingDistance(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bmp_ahash", exprs => BmpAHash(exprs(0)), "built-in")
      // Runtime-filter primitives (the same Catalyst expressions Spark's
      // InjectRuntimeFilter composes, exposed as functions so the engine can
      // build join-pruning blooms on ITS schedule — see engine.BloomPrune):
      // bloom_build(key, estimatedItems) aggregates xxhash64(key) into a
      // serialized bloom; bloom_might_contain(bloomBinary, key) probes it.
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bloom_build",
        exprs => new BloomFilterAggregate(new XxHash64(Seq(exprs(0))),
          // int literals coerce to the required BIGINT (cast of a literal
          // stays foldable, which the aggregate requires)
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.LongType)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bloom_might_contain",
        exprs => BloomFilterMightContain(exprs(0), new XxHash64(Seq(exprs(1)))), "built-in")
      // sidecar-bloom words built inside the data-write job (observe-fused;
      // see SnapshotParquetSink.observeBlooms): (bucket, xxhash64) → per-
      // bucket encoded filters
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bloom_words", exprs => BloomWordsAgg(exprs(0), exprs(1)), "built-in")
    }

  /** Codegen cosine similarity (see [[CosineSimilarity]]); requires
    * [[register]] on the session first (Tables.ensure and the Similarity
    * entry points do it).
    */
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def hamming(a: Column, b: Column): Column = call_function("hamming", a, b)
  def bmp_ahash(media: Column): Column = call_function("bmp_ahash", media)
}
