package graft.engine

import org.apache.spark.sql.DataFrame

/** Bucketed co-located joins (100 TB pattern, SURVEY §4): both sides are
  * pre-partitioned into the same bucket count on the join key at WRITE time,
  * so every subsequent join/aggregation on that key is shuffle-free — the
  * scan itself delivers the required distribution. This is the amortization
  * play for fact tables joined repeatedly on the same key: pay one shuffle
  * at ingest, never again.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
