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

  /** The generation readers and appenders bind to ([[Generations]]). */
  def liveGen: Long = Generations.liveGen(dir)

  private def base(g: Long): String = if (g == 0L) dir else s"$dir/gen=$g"

  /** Sketch one batch's per-group partials and commit them under the live
    * generation's `batch=<batchId>`. One narrow aggregation over the new
    * batch — map-side partials, one shuffle on the group key, tiny output.
    */
  def append(batch: DataFrame, groupCols: Seq[String], valueCol: String,
      batchId: Long): Unit =
    batch.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"),
        count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(s"${base(liveGen)}/batch=$batchId")

  /** Batch dirs whose write COMMITTED — [[BatchStore.committedBatchPaths]],
    * the uncommitted-data-never-surfaces contract shared with
    * [[HeavyHitterStore]] and mirroring the snapshot sink's manifest.
    */
  def committedBatchPaths: Seq[String] =
    BatchStore.committedBatchPaths(base(liveGen))

  /** Merge every COMMITTED partial: per group, the unioned-sketch estimate
    * plus batch/row bookkeeping. Reads only sketch rows — history's data
    * files are never touched.
    */
  def estimates(spark: SparkSession, groupCols: Seq[String]): DataFrame = {
    val b = base(liveGen) // resolve once: paths and basePath must agree
    val paths = BatchStore.committedBatchPaths(b)
    require(paths.nonEmpty, s"no committed sketch batches at $dir")
    spark.read.option("basePath", b).parquet(paths: _*)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("estimate"),
        countDistinct(col("batch")).cast("bigint").as("n_batches"),
        sum(col("n_rows")).cast("bigint").as("n_rows"))
  }

  /** Store maintenance: union every committed partial into ONE partial per
    * group (HLL union is associative and idempotent at a fixed lgK, so a
    * compacted store answers [[estimates]] identically — except
    * `n_batches`, which becomes 1 by construction), published as the next
    * generation ([[Generations]] — readers safe during the rewrite, no
    * reader window; superseded partials stay for in-flight readers until
    * [[vacuumGenerations]]). A year of daily appends collapses from 365
    * batch dirs to one. Single-maintainer contract: no concurrent appends.
    */
  def compact(spark: SparkSession): Unit = synchronized {
    val g = liveGen
    val ng = g + 1
    Generations.clearPartial(dir, ng)
    val b = base(g)
    val paths = BatchStore.committedBatchPaths(b)
    require(paths.nonEmpty, s"nothing to compact at $dir")
    val raw = spark.read.option("basePath", b).parquet(paths: _*)
    val groupCols = raw.columns.filterNot(Set("sk", "n_rows", "batch")).toSeq
    raw.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sk")).as("sk"), sum(col("n_rows")).as("n_rows"))
      .coalesce(1)
      // batch id −1: outside Spark's non-negative epoch space, so no
      // replayed append can overwrite the merged partial
      .write.mode("overwrite").parquet(s"${base(ng)}/batch=-1")
    Generations.publish(dir, ng, "sketch-store compaction")
  }

  /** Age-guarded reclaim of superseded generations ([[Generations]]). */
  def vacuumGenerations(minAgeMs: Long = 3600000L): Int = {
    val flat = graft.engine.Dfs.list(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("batch="))
    Generations.vacuum(dir, flat.toSeq, minAgeMs)
  }
}
