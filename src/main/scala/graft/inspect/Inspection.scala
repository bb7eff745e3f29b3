package graft.inspect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-derived metadata queries the reference gets from the inspection API
  * (R20–R22, R25): field first-seen times, value distributions, table
  * discovery. All are single-shuffle aggregations.
  */
object Inspection {

  /** R20 (add_output.py:264-274): earliest event time at which each listed
    * column was observed non-null. Drives the schema-evolution backfill
    * window (R19: replay from `min(firstSeen) − 1 minute`).
    */
  def firstSeen(df: DataFrame, tsCol: Column, cols: Seq[(String, Column)]): DataFrame = {
    val aggs = cols.map { case (name, c) =>
      min(when(c.isNotNull, tsCol)).as(name)
    }
    // one pass over the data for ALL columns (the reference probes one HTTP
    // round-trip per column; here a single aggregate), then unpivot.
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackExpr) AS (column_name, first_seen)")
  }

  /** R21 (add_output.py:524-534): distinct values + frequencies, capped —
    * `TakeOrderedAndProject` physically, so the cap bounds driver memory.
    */
  def valueDistribution(df: DataFrame, value: Column, take: Int): DataFrame =
    df.groupBy(value.as("value")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value"))
      .limit(take)

  /** R25: table discovery = distribution of the derived full table name. */
  def tables(envelope: DataFrame): DataFrame =
    graft.cdc.CdcPipeline.withFullTableName(envelope)
      .select(col("full_table_name")).distinct()
}
