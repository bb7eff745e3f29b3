package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Tables

/** One declared t2 query: an engine-side plan builder plus (where
  * SQL-expressible) an equivalent DuckDB oracle SQL string. The driver runs
  * the builder at sf0.01, the oracle in DuckDB over the same parquet tables,
  * and hash-compares canonical output (SURVEY §2.2).
  *
  * Canonicalization policy used by every query here:
  *   - NO decimal- or double-typed output columns at all: the driver's hash
  *     canonicalizer formats decimals through a float conversion on one side,
  *     so any value with trailing zeros at its scale (e.g. 44.0000)
  *     hash-mismatches even when values are byte-identical. Numeric results
  *     are computed in DECIMAL with explicit scale (double arithmetic itself
  *     is IEEE-identical across engines, decimal arithmetic is exact) and
  *     then CAST to STRING on BOTH sides — Spark and DuckDB render a
  *     DECIMAL(p,s) identically at full declared scale. Ordering/ranking
  *     always happens on the decimal value BEFORE the string cast;
  *   - no raw timestamps in output: epoch microseconds as BIGINT
  *     (`unix_micros` engine-side, `epoch_us` oracle-side);
  *   - integer-typed outputs normalized to BIGINT (DuckDB count/sum/length
  *     return BIGINT/HUGEINT where Spark returns INT/LONG);
  *   - aliases identical on both sides (driver sorts columns by name).
  */
final case class QDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {

  /** Engine side is Spark SQL over the registered canonical views — a fully
    * declarative Catalyst plan (same optimization surface as the DataFrame
    * API). Oracle is DuckDB SQL, textually shared where dialects agree.
    */
  def sql(name: String, engineSql: String, oracleSql: String): QDef =
    QDef(name, (s, dir) => { Tables.ensure(s, dir); s.sql(engineSql) }, Some(oracleSql))

  /** Shared-SQL query: the exact same text runs on Spark and DuckDB. */
  def shared(name: String, q: String): QDef = sql(name, q, q)

  /** Builder-based query (DataFrame API / library code engine-side). */
  def df(name: String, oracleSql: String)(build: (SparkSession, String) => DataFrame): QDef =
    QDef(name, (s, dir) => { Tables.ensure(s, dir); build(s, dir) }, Some(oracleSql))

  /** Engine-only query — no DuckDB-expressible oracle; the driver records a
    * rows-only check and ScalaTest carries the semantics (SURVEY §5).
    */
  def engineOnly(name: String)(build: (SparkSession, String) => DataFrame): QDef =
    QDef(name, (s, dir) => { Tables.ensure(s, dir); build(s, dir) }, None)

  /** Materializes a small-by-construction result into a local frame so a
    * managed cache (Ranking/Dedup/Ivf thunk scopes) can be released before
    * the caller consumes the rows.
    */
  def localized(s: SparkSession, df: DataFrame): DataFrame =
    Tables.localize(s, df)
}
