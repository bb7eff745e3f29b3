package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent mergeable-sketch store — the materialized-aggregate pattern
  * that keeps cardinality analytics incremental at 100 TB: each ingested
  * batch writes its per-group HLL partials (KBs per group, regardless of
  * batch row count) under `dir/batch=<id>`; a cardinality query merges the
  * stored partials with `hll_union_agg` and never re-reads history. The
  * mirror of [[graft.llm.Dedup.incrementalLshCandidates]]'s band store, for
  * the COUNT-DISTINCT side of the house: ingest cost is one pass over the
  * NEW batch only, query cost is proportional to (groups × batches), not
  * corpus rows.
  *
  * Properties the tests pin:
  *   - append touches ONLY its own `batch=<id>` directory and is an
  *     idempotent overwrite (the CDC sinks' re-run contract);
  *   - merged estimates are associative: estimates over stored partials
  *     equal a from-scratch sketch of the union (within the HLL rsd);
  *   - partials are Datasketches HLL bytes (Spark 4 builtins), the
  *     cross-job exchange format — any Spark job's partials merge with any
  *     other's at the same or compatible lgK.
  */
final class HllSketchStore(val dir: String, lgK: Int = 12) {

  /** Sketch one batch's per-group partials and commit them under
    * `dir/batch=<batchId>`. One narrow aggregation over the new batch —
    * map-side partials, one shuffle on the group key, tiny output.
    */
  def append(batch: DataFrame, groupCols: Seq[String], valueCol: String,
      batchId: Long): Unit =
    batch.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"),
        count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(s"$dir/batch=$batchId")

  /** Batch dirs whose write COMMITTED — [[BatchStore.committedBatchPaths]],
    * the uncommitted-data-never-surfaces contract shared with
    * [[HeavyHitterStore]] and mirroring the snapshot sink's manifest.
    */
  def committedBatchPaths: Seq[String] = BatchStore.committedBatchPaths(dir)

  /** Merge every COMMITTED partial: per group, the unioned-sketch estimate
    * plus batch/row bookkeeping. Reads only sketch rows — history's data
    * files are never touched.
    */
  def estimates(spark: SparkSession, groupCols: Seq[String]): DataFrame = {
    val paths = committedBatchPaths
    require(paths.nonEmpty, s"no committed sketch batches at $dir")
    spark.read.option("basePath", dir).parquet(paths: _*)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("estimate"),
        countDistinct(col("batch")).cast("bigint").as("n_batches"),
        sum(col("n_rows")).cast("bigint").as("n_rows"))
  }
}
