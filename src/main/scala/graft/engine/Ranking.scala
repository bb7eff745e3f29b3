package graft.engine

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
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
      // rows by construction, so the collect is bounded (and enforced)
      val totals = GraftSession.boundedCollect(
        sorted.groupBy(col("__pid")).agg(sum(col("__v")).as("__t")),
        parts, "prefixSum partition totals")
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
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
      accuracy: Int = 10000): Option[Any] =
    exactQuantiles(df0, valueCol, Seq(q), accuracy).head

  /** Multi-quantile [[exactQuantile]]: ALL requested quantiles come off one
    * shared set of scans — one count, ONE sketch call bracketing every q,
    * one conditional-aggregation pass computing every bracket's below/in
    * counts, and one distributed rank over the union of (tiny) brackets.
    * Scan count is independent of `qs.size` — the per-q formulation pays
    * ~5 full passes per quantile; this pays 4 total.
    */
  def exactQuantiles(df0: DataFrame, valueCol: Column, qs: Seq[Double],
      accuracy: Int = 10000): Seq[Option[Any]] = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1]; got $q"))
    val k = qs.size
    val df = df0.select(valueCol.as("__v")).filter(col("__v").isNotNull)
    val n = df.count()
    if (n == 0) return qs.map(_ => None)
    val ranks = qs.map(q => math.floor((n - 1) * q).toLong + 1) // 1-based
    val eps = scala.collection.mutable.ArraySeq.fill(k)(math.max(n / accuracy, 1L))
    var attempt = 0
    while (attempt < 20) {
      val qlos = qs.indices.map(i => math.max(0.0, qs(i) - eps(i).toDouble * 2 / n))
      val qhis = qs.indices.map(i => math.min(1.0, qs(i) + eps(i).toDouble * 2 / n))
      val b = df.agg(percentile_approx(col("__v"),
        array((qlos ++ qhis).map(lit): _*), lit(accuracy)).as("b")).head.getSeq[Any](0)
      val (los, his) = (b.take(k), b.drop(k))
      val inBracket = qs.indices.map(i =>
        col("__v") >= lit(los(i)) && col("__v") <= lit(his(i)))
      // every bracket's rank offsets in ONE pass
      val aggs = qs.indices.flatMap(i => Seq(
        sum(when(col("__v") < lit(los(i)), 1L).otherwise(0L)).as(s"__below_$i"),
        sum(when(inBracket(i), 1L).otherwise(0L)).as(s"__in_$i")))
      val row = df.agg(aggs.head, aggs.tail: _*).head
      val belows = qs.indices.map(i => row.getLong(2 * i))
      val ins = qs.indices.map(i => row.getLong(2 * i + 1))
      val ok = qs.indices.forall(i => belows(i) < ranks(i) && belows(i) + ins(i) >= ranks(i))
      if (ok) {
        // tag each row with every bracket containing it (brackets may
        // overlap; a row then ranks once per bracket) and resolve all k
        // order statistics in one distributed rank over the bracket union
        val tagged = df.select(explode(array_compact(array(
          qs.indices.map(i => when(inBracket(i), lit(i))): _*))).as("__b"), col("__v"))
        // bracket i's rows start at Σ_{j<i} in_j under the (__b, __v) order
        val offsets = ins.scanLeft(0L)(_ + _)
        val targets = qs.indices.map(i => i -> (offsets(i) + ranks(i) - belows(i) - 1)).toMap
        return withGlobalIndex(tagged, Seq(col("__b"), col("__v"))) { idx =>
          val hitCond = targets.map { case (i, t) =>
            col("__b") === lit(i) && col("__idx") === lit(t)
          }.reduce(_ || _)
          val hits = GraftSession.boundedCollect(
            idx.filter(hitCond).select(col("__b"), col("__v")),
            qs.size, "quantile bracket hits") // ≤ k rows
            .map(r => r.getInt(0) -> r.get(1)).toMap
          qs.indices.map(i => Some(hits(i)))
        }
      }
      qs.indices.foreach { i =>
        if (!(belows(i) < ranks(i) && belows(i) + ins(i) >= ranks(i))) eps(i) *= 4
      }
      attempt += 1
    }
    throw new IllegalStateException(
      s"exactQuantiles bracket never converged (n=$n, qs=$qs) — sketch misbehaving")
  }

  /** [[exactQuantile]] per group, for LOW-cardinality group columns
    * (flags, statuses, languages — the cases where per-group percentiles
    * are actually read by humans; the call REFUSES high-cardinality columns
    * rather than silently collecting an unbounded bracket table — those
    * belong to `approx_percentile` + the q29b-style contract).
    *
    * ALL groups resolve off three shared scans — no per-group driver loop:
    *   1. one grouped agg: per-group count + sketch. The bracket half-width
    *      is fixed in QUANTILE space (2/accuracy ≥ the GK rank-error n/a in
    *      quantile units for every group size), so one foldable
    *      percentile_approx percentage array serves every group;
    *   2. one grouped conditional agg (bracket bounds broadcast back):
    *      per-group below/in counts, verified against the target rank and
    *      widened ×4 on the (backstop) miss;
    *   3. one filtered scan keeps only in-bracket rows — ~4·n_g/accuracy
    *      rows per group — and a window partitioned BY GROUP ranks them
    *      (distributed across groups; within a group the bracket is tiny
    *      by the sketch guarantee, so the per-partition sort is bounded).
    */
  def exactQuantileByGroup(df: DataFrame, groupCol: Column, valueCol: Column,
      q: Double, maxGroups: Int = 64, accuracy: Int = 10000): Seq[(Any, Any)] = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1]; got $q")
    val spark = df.sparkSession
    val base = df.select(groupCol.as("__g"), valueCol.as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    var qeps = 2.0 / accuracy
    var attempt = 0
    while (attempt < 20) {
      val qlo = math.max(0.0, q - qeps)
      val qhi = math.min(1.0, q + qeps)
      val statsDf = base.groupBy("__g")
        .agg(count(lit(1)).as("__n"),
          percentile_approx(col("__v"), array(lit(qlo), lit(qhi)), lit(accuracy)).as("__b"))
        .limit(maxGroups + 1) // deliberate +1: the overflow probe
      val stats = GraftSession.boundedCollect(statsDf,
        maxGroups + 1, "group quantile stats")
      require(stats.length <= maxGroups,
        s"more than $maxGroups groups — use approx_percentile for high-cardinality grouping")
      val bounds = stats.map { r =>
        val b = r.getSeq[Any](2)
        Row(r.get(0), r.getLong(1), math.floor((r.getLong(1) - 1) * q).toLong + 1, b(0), b(1))
      }
      val gType = base.schema("__g").dataType
      val vType = base.schema("__v").dataType
      val boundsDf = spark.createDataFrame(spark.sparkContext.parallelize(bounds.toSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          StructField("__g", gType, nullable = false),
          StructField("__n", LongType, nullable = false),
          StructField("__r", LongType, nullable = false),
          StructField("__lo", vType), StructField("__hi", vType))))
      val joined = base.join(broadcast(boundsDf), "__g")
      val countsDf = joined.groupBy(col("__g"), col("__r"))
        .agg(sum(when(col("__v") < col("__lo"), 1L).otherwise(0L)).as("__below"),
          sum(when(col("__v") >= col("__lo") && col("__v") <= col("__hi"), 1L)
            .otherwise(0L)).as("__in"))
      val counts = GraftSession.boundedCollect(countsDf,
        maxGroups, "group quantile counts") // ≤ maxGroups rows
      val ok = counts.forall(r =>
        r.getLong(2) < r.getLong(1) && r.getLong(2) + r.getLong(3) >= r.getLong(1))
      if (ok) {
        val belowDf = spark.createDataFrame(
          spark.sparkContext.parallelize(counts.map(r => Row(r.get(0), r.getLong(2))).toSeq, 1),
          org.apache.spark.sql.types.StructType(Seq(
            StructField("__g", gType, nullable = false),
            StructField("__below", LongType, nullable = false))))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__g")).orderBy(col("__v"))
        return GraftSession.boundedCollect(
          joined.filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
            .join(broadcast(belowDf), "__g")
            .withColumn("__rk", row_number().over(w))
            .filter(col("__rk") === col("__r") - col("__below"))
            .select(col("__g"), col("__v")),
          maxGroups, "group quantile results") // one row per group
          .map(r => (r.get(0), r.get(1)))
          .sortBy(_._1.toString).toSeq
      }
      qeps *= 4
      attempt += 1
    }
    throw new IllegalStateException(
      s"exactQuantileByGroup bracket never converged (q=$q) — sketch misbehaving")
  }

  /** Exact WEIGHTED quantiles over integer values/weights — the
    * importance-weighted statistic a reweighted corpus needs (each row
    * counts `w` times; the dedup weights of q90k or mixture rates of q97h
    * are exactly such weights): quantile q/1000 = the smallest value v
    * whose cumulative weight satisfies cum·1000 ≥ total·q. Pure integer
    * comparisons — no interpolation, engine-exact.
    *
    * Shape: one grouped weight-sum per distinct value (map-side
    * combinable), one cumulative window over the DISTINCT-value frame
    * (value-domain-sized, not row-sized), one broadcast total. Returns one
    * row with a `p<q>` column per requested quantile.
    */
  def weightedQuantiles(df: DataFrame, valueCol: Column, weightCol: Column,
      qsX1000: Seq[Int]): DataFrame = {
    require(qsX1000.nonEmpty && qsX1000.forall(q => q > 0 && q <= 1000),
      "quantiles must be in (0, 1000]")
    val spark = df.sparkSession
    val s = df.select(valueCol.cast("long").as("v"), weightCol.cast("long").as("w"))
      .groupBy("v").agg(sum(col("w")).as("wv"))
    // cumulative weight via the distributed prefix sum (no global window);
    // the frame it runs over is the distinct-VALUE domain, already reduced
    prefixSum(s, col("wv"), Seq(col("v"))) { withPs =>
      // total off the PERSISTED grouped frame — aggregating the raw input
      // again would re-run its whole lineage a second time per call
      val cum = withPs.withColumn("cum", col("__psum") + col("wv"))
        .crossJoin(broadcast(withPs.agg(sum(col("wv")).as("tot"))))
      val aggs = qsX1000.map(q =>
        min(when(col("cum") * 1000 >= col("tot") * q, col("v"))).as(s"p$q"))
      val row = GraftSession.boundedCollect(
        cum.agg(aggs.head, aggs.tail: _*), 1, "weighted quantiles").head // 1 row
      spark.createDataFrame(java.util.Arrays.asList(row),
        org.apache.spark.sql.types.StructType(
          qsX1000.map(q => StructField(s"p$q", LongType))))
    }
  }
}
