package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent additive-count store — the simplest member of the
  * incremental-analytics store family (bands = similarity, HLL =
  * cardinality, MG = frequency, postings = retrieval, this = plain
  * counts): each batch commits its GROUPED per-key counts under a
  * `_SUCCESS`-gated `batch=<id>` dir (one tiny write, sized by key count,
  * not batch rows), and reads merge by summing — counts are the one
  * statistic whose partials compose with no sketch error at all. The
  * accumulated stream is never re-read: per-batch cost is one pass over
  * the NEW rows, read cost is (keys × batches) partial rows.
  *
  * Same commit contract as the sketch stores: idempotent per-batch
  * overwrite (a replayed batch rewrites its own dir with identical
  * content), appends never touch history, uncommitted partials invisible.
  */
final class CountStore(val dir: String) {

  /** Commits one batch's grouped counts over `keyCols`. */
  def append(batch: DataFrame, keyCols: Seq[String], batchId: Long): Unit = {
    batch.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/batch=$batchId")
    ()
  }

  /** Merged running counts per key over everything ever committed. */
  def counts(spark: SparkSession, keyCols: Seq[String]): DataFrame = {
    val paths = BatchStore.committedBatchPaths(dir)
    require(paths.nonEmpty, s"no committed count batches at $dir")
    spark.read.option("basePath", dir).parquet(paths: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"))
  }
}
