package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Delete handling at the sink, per the reference's two modes
  * (add_output.py:138-150): hard = remove the row, logical = keep it with a
  * boolean `is_deleted` column (README.md:61).
  */
sealed trait DeleteMode
object DeleteMode {
  case object Hard extends DeleteMode
  case object Logical extends DeleteMode
}

/** MERGE-shaped warehouse sink (R7/R28/R29): `merge` applies a micro-batch
  * of CDC events (arbitrary order, any mix of inserts/updates/deletes) with
  * last-write-wins by `seqCol` per `keys`.
  *
  * Implementations must be idempotent under batch replay (same batch merged
  * twice ⇒ same state) — that is what makes `foreachBatch` exactly-once on
  * restart. A real Snowflake/Delta MERGE drops behind this interface
  * unchanged; [[SnowflakeSqlGen]] generates that SQL.
  */
trait UpsertSink {
  def merge(batch: DataFrame, keys: Seq[String], seqCol: String, isDeleteCol: String): Unit
  /** Current table state under the given delete mode. */
  def read(spark: SparkSession, mode: DeleteMode): DataFrame

  /** Truncate-and-load: rebuild the table from `batch` ALONE — prior state
    * is entirely superseded and contributes nothing to the result, not even
    * its column types (a type-widening replay MUST NOT union with the
    * stored narrow columns: ANSI union coercion would resolve a
    * string-widened column back to the stored timestamp/numeric type and
    * the widening would silently not take). Same in-batch last-write-wins
    * dedup as [[merge]]; generation counters continue from the prior state
    * so replayed micro-batches stay deterministically ordered afterwards.
    */
  def replaceAll(batch: DataFrame, keys: Seq[String], seqCol: String, isDeleteCol: String): Unit
}
