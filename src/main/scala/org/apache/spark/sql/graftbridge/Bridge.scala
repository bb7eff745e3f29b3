package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal bridge into the `private[sql]` constructor for Datasets over
  * custom logical plans — the one seam SparkSessionExtensions doesn't cover
  * when building a DataFrame from an injected operator (standard extension-
  * library pattern; everything else in graft uses public API only).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A batch-computed frame re-wrapped as a STREAMING DataFrame — the V1
    * `Source.getBatch` contract (MicroBatchExecution asserts
    * `isStreaming=true` on the returned plan). Same seam the built-in V1
    * sources use (`internalCreateDataFrame(rdd, schema, isStreaming)`);
    * the rows are materialized through the batch plan's `toRdd`, so the
    * streaming wrapper adds no recomputation.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
