package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (100 TB design note, SURVEY
  * §4). AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one key dominates so heavily that even a
  * split partition exceeds executor memory, or when AQE is unavailable
  * (e.g. inside `foreachBatch`).
  */
object Skew {

  /** Salted equi-join: the large (skewed) side scatters each row into one of
    * `factor` salt buckets; the smaller side replicates each row `factor`
    * times. The join key becomes (key, salt), splitting every hot key's hash
    * partition `factor` ways. Row-level scatter uses a hash of the whole row
    * so it's deterministic under retries.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(factor.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
