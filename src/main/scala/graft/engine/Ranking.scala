package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Scalable global ordering operators. An empty-PARTITION-BY window
  * (`ntile() OVER (ORDER BY ...)`, global `row_number`) collapses the whole
  * dataset into ONE task — fine at t2 scale, fatal at 100 TB. These
  * equivalents keep the data distributed: range-repartition by the sort key
  * (Spark samples boundaries), sort within partitions, then turn per-
  * partition positions into global positions with a tiny driver-side offset
  * table (one long per partition).
  */
object Ranking {

  /** Appends `__idx` = 0-based global position under the given total order.
    * Two jobs: one to count rows per range partition, one to emit. The sort
    * columns should form a total order for a deterministic result.
    */
  def withGlobalIndex(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    // persist the sorted rows: zipWithIndex runs one extra job to learn
    // partition sizes, and downstream consumers (ntileScalable's count +
    // the final read) would otherwise re-run the whole shuffle+sort per pass
    val sorted = df.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withIdx = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    df.sparkSession.createDataFrame(withIdx,
      sorted.schema.copy(fields = sorted.schema.fields :+ StructField("__idx", LongType, nullable = false)))
  }

  /** Exact SQL `ntile(n)` semantics without a single-partition window: the
    * first (N mod n) tiles get ceil(N/n) rows, the rest floor(N/n).
    */
  def ntileScalable(df: DataFrame, n: Int, sortCols: Seq[Column]): DataFrame = {
    val indexed = withGlobalIndex(df, sortCols)
    val total = indexed.count() // one extra count; cache `indexed` upstream if reused
    val base = total / n
    val rem = total % n
    val cut = (base + 1) * rem // rows below this index sit in the bigger tiles
    val tile = when(col("__idx") < cut, (col("__idx") / (base + 1)).cast("long") + 1)
      .otherwise(lit(rem) + ((col("__idx") - cut) / math.max(base, 1)).cast("long") + 1)
    indexed.withColumn("tile", tile).drop("__idx")
  }
}
