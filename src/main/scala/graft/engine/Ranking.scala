package graft.engine

import scala.jdk.CollectionConverters._
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
  *
  * Both operators need a persisted intermediate (zipWithIndex runs one extra
  * job to learn partition sizes, and downstream consumers would otherwise
  * re-run the whole shuffle+sort per pass), so they take the consumption as
  * a thunk and unpersist on exit — a long-lived session leaks nothing.
  */
object Ranking {

  /** Runs `consume` over a frame extended with `__idx` = 0-based global
    * position under the given total order, releasing the internal cache
    * afterwards. Work that must not be recomputed has to be materialized
    * inside `consume` (the cached plan is dropped on exit). The sort columns
    * should form a total order for a deterministic result.
    */
  def withGlobalIndex[T](df: DataFrame, sortCols: Seq[Column])(consume: DataFrame => T): T = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val sorted = df.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val withIdx = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
      val indexed = df.sparkSession.createDataFrame(withIdx,
        sorted.schema.copy(fields = sorted.schema.fields :+ StructField("__idx", LongType, nullable = false)))
      consume(indexed)
    } finally {
      sorted.unpersist()
      ()
    }
  }

  /** Global EXCLUSIVE prefix sum of `valueCol` under a total order, without
    * a single-partition window: range-repartition by the sort key, cumsum
    * within each partition (a window PARTITIONED by the physical partition
    * id — every partition sums in parallel), then lift local sums to global
    * ones with a driver-side offset table (one long per partition, the same
    * trick [[withGlobalIndex]] plays with row counts), attached back via a
    * broadcast join on the partition id — O(1) per row at any partition
    * count (a per-partition CASE chain would be O(P) per row and overflow
    * codegen at cluster-sized P). Adds `__psum` = sum of `valueCol` over
    * all STRICTLY-PRECEDING rows (0 for the first). Null values count as 0.
    * Same managed-scope contract as [[withGlobalIndex]].
    */
  def prefixSum[T](df: DataFrame, valueCol: Column, sortCols: Seq[Column])(
      consume: DataFrame => T): T = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", coalesce(valueCol.cast(LongType), lit(0L)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // per-partition totals -> exclusive offsets; ≤ numShufflePartitions
      // rows by construction, so the collect is bounded
      val totals = sorted.groupBy(col("__pid")).agg(sum(col("__v")).as("__t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val pids = totals.keys.toSeq.sorted
      val offsets = pids.zip(pids.scanLeft(0L)((acc, pid) => acc + totals(pid)).init)
      val offsetsDf = spark.createDataFrame(offsets.map { case (p, o) => Row(p, o) }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          StructField("__pid", org.apache.spark.sql.types.IntegerType, nullable = false),
          StructField("__off", LongType, nullable = false))))
      // running (inclusive) local sum minus own value = local exclusive sum
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__pid")).orderBy(sortCols: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val out = sorted
        .join(broadcast(offsetsDf), "__pid")
        .withColumn("__psum", sum(col("__v")).over(w) - col("__v") + col("__off"))
        .drop("__pid", "__v", "__off")
      consume(out)
    } finally {
      sorted.unpersist()
      ()
    }
  }

  /** Exact SQL `ntile(n)` semantics without a single-partition window: the
    * first (N mod n) tiles get ceil(N/n) rows, the rest floor(N/n). Same
    * managed-scope contract as [[withGlobalIndex]].
    */
  def ntileScalable[T](df: DataFrame, n: Int, sortCols: Seq[Column])(consume: DataFrame => T): T =
    withGlobalIndex(df, sortCols) { indexed =>
      val total = indexed.count() // cheap: runs over the cached sorted frame
      val base = total / n
      val rem = total % n
      val cut = (base + 1) * rem // rows below this index sit in the bigger tiles
      val tile = when(col("__idx") < cut, (col("__idx") / (base + 1)).cast("long") + 1)
        .otherwise(lit(rem) + ((col("__idx") - cut) / math.max(base, 1)).cast("long") + 1)
      consume(indexed.withColumn("tile", tile).drop("__idx"))
    }

  /** EXACT lower (discrete) quantile at scale. Spark's built-in
    * `percentile` buffers every value of the aggregation in memory — fatal
    * on a 100 TB column; `approx_percentile` is bounded but approximate.
    * This returns the exact order statistic at rank
    * `floor((n−1)·q) + 1` in a bounded number of distributed passes:
    *
    *   1. approx sketch brackets the answer — rank error ≤ n/accuracy by
    *      the GK guarantee, so the bracket holds ~n/accuracy·4 rows;
    *   2. one count below the bracket fixes the subset's rank offset;
    *   3. the subset ranks distributedly via [[withGlobalIndex]] (range
    *      partition + zipWithIndex — never one task) and row
    *      `r − below − 1` is the answer.
    *
    * The bracket is verified against the counts and widened (×4) if the
    * sketch under-delivered — at the documented accuracy that loop does not
    * trigger; it is a correctness backstop, not a hot path. Returns None on
    * an empty / all-null column.
    */
  def exactQuantile(df0: DataFrame, valueCol: Column, q: Double,
      accuracy: Int = 10000): Option[Any] = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1]; got $q")
    val df = df0.select(valueCol.as("__v")).filter(col("__v").isNotNull)
    val n = df.count()
    if (n == 0) return None
    val r = math.floor((n - 1) * q).toLong + 1 // 1-based lower-quantile rank
    var epsRanks = math.max(n / accuracy, 1L)
    var attempt = 0
    while (attempt < 20) {
      val qlo = math.max(0.0, q - epsRanks.toDouble * 2 / n)
      val qhi = math.min(1.0, q + epsRanks.toDouble * 2 / n)
      val b = df.agg(percentile_approx(col("__v"),
        array(lit(qlo), lit(qhi)), lit(accuracy)).as("b")).head.getSeq[Any](0)
      val (lo, hi) = (b(0), b(1))
      val below = df.filter(col("__v") < lit(lo)).count()
      val subset = df.filter(col("__v") >= lit(lo) && col("__v") <= lit(hi))
      val inCount = subset.count()
      if (below < r && below + inCount >= r)
        return Some(withGlobalIndex(subset, Seq(col("__v"))) { idx =>
          idx.filter(col("__idx") === (r - below - 1)).head.get(0)
        })
      epsRanks *= 4
      attempt += 1
    }
    throw new IllegalStateException(
      s"exactQuantile bracket never converged (n=$n, q=$q) — sketch misbehaving")
  }

  /** [[exactQuantile]] per group, for LOW-cardinality group columns
    * (flags, statuses, languages — the cases where per-group percentiles
    * are actually read by humans). The group list is collected (bounded by
    * `maxGroups` — the call REFUSES high-cardinality columns rather than
    * silently looping thousands of jobs) and each group's quantile runs
    * through the bounded-memory exact path; partition pruning/pushdown
    * makes each per-group pass a filtered scan. High-cardinality grouped
    * quantiles belong to `approx_percentile` + the q29b-style contract.
    */
  def exactQuantileByGroup(df: DataFrame, groupCol: Column, valueCol: Column,
      q: Double, maxGroups: Int = 64): Seq[(Any, Any)] = {
    val groups = df.select(groupCol.as("__g")).filter(col("__g").isNotNull)
      .distinct().limit(maxGroups + 1).collect().map(_.get(0)).toSeq
    require(groups.size <= maxGroups,
      s"more than $maxGroups groups — use approx_percentile for high-cardinality grouping")
    groups.sortBy(_.toString).flatMap { g =>
      exactQuantile(df.filter(groupCol === lit(g)), valueCol, q).map(v => (g, v))
    }
  }
}
