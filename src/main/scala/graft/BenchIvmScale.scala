package graft

import org.apache.spark.sql.functions._

/** Bench-only scale ladder for the IVM + change-feed family (SURVEY §8.12):
  * the "refresh is O(changed), never O(table)" claim measured as a curve —
  * deterministic synthetic tables at 1×/10×/100× a base row count, a FIXED
  * 20-key change set, buckets sized to constant volume per rung (as any
  * 100 TB layout does: more data ⇒ more buckets, not bigger ones).
  *
  * Claims measured per rung:
  *   - `changed_files`: the manifest-level diff plans only the buckets the
  *     20-key batch rewrote (≈20 of B), independent of table size;
  *   - `refresh_sec` ([[graft.sink.MaterializedAgg.refresh]]): flat across
  *     a 100× table growth — the dirty-group diff reads changed buckets,
  *     the recompute reads only the dirty groups' rows;
  *   - `feed_sec` ([[graft.sink.SnapshotParquetSink.changesBetween]]): the
  *     change data feed is bucket-pruned the same way;
  *   - `recompute_sec`: the from-scratch GROUP BY baseline the view
  *     replaces — grows with the table, so `speedup` (recompute/refresh)
  *     widens with scale.
  *
  * Synthesis is pure integer arithmetic (no RNG). Emits ONE JSON line:
  * {"ivm":{"<rows>":{...}}}
  */
object BenchIvmScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = args.headOption.map(_.toLong).getOrElse(100000L)
    val mults = if (args.length > 1) args(1).split(',').toSeq.map(_.toLong)
      else Seq(1L, 10L, 100L)
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val scratch = java.nio.file.Files.createTempDirectory("ivmscale").toString

    // groups at n/10 cardinality — the per-entity rollup shape IVM exists
    // for: the maintained view is itself large, so a from-scratch refresh
    // rewrites n/10 rows where the incremental path merges ~20
    def table(n: Long, seq: Long) = spark.range(n).select(
      col("id"),
      pmod(xxhash64(col("id")), lit(math.max(1000L, n / 10L))).as("grp"),
      (xxhash64(col("id"), lit(seq)) % 1000000L).as("v"),
      lit(seq).as("seq"),
      lit(false).as("__del"))

    // the FIXED change set: 20 keys spread across the id space
    def changes(n: Long, seq: Long) =
      table(n, seq).filter(pmod(col("id"), lit(n / 20L)) === 0)

    // warm-up rung (untimed): codegen + shuffle machinery
    locally {
      val s = new graft.sink.SnapshotParquetSink(s"$scratch/warm", 8)
      s.merge(table(5000L, 1L), Seq("id"), "seq", "__del")
      val a = new graft.sink.SnapshotParquetSink(s"$scratch/warm_agg", 8)
      val m = new graft.sink.MaterializedAgg(s, a, Seq("grp"),
        Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      m.refresh(spark)
      s.merge(changes(5000L, 2L), Seq("id"), "seq", "__del")
      m.refresh(spark)
      ()
    }

    def rung(tag: String, n: Long, groupCols: Seq[String]): String = {
      // constant-volume buckets: ~25k rows per bucket at every rung
      val nBuckets = math.max(8, (n / 25000L).toInt)
      val src = new graft.sink.SnapshotParquetSink(s"$scratch/${tag}_src_$n", nBuckets)
      val agg = new graft.sink.SnapshotParquetSink(s"$scratch/${tag}_agg_$n",
        if (groupCols.contains("id")) nBuckets else math.max(8, nBuckets / 8))
      val m = new graft.sink.MaterializedAgg(src, agg, groupCols,
        Seq(count(lit(1)).as("n_rows"), sum(col("v")).as("sv"),
          min(col("v")).as("mn"), max(col("v")).as("mx")))
      src.merge(table(n, 1L), Seq("id"), "seq", "__del")
      val (_, buildSec) = timed(m.refresh(spark))
      src.merge(changes(n, 2L), Seq("id"), "seq", "__del")
      val changedFiles = src.changedEntriesAt(1L, 0L).length
      val (_, refreshSec) = timed(m.refresh(spark))
      // write-side volumes: the incremental path rewrites only the agg
      // buckets the ~20 dirty groups hash to; a from-scratch refresh
      // rewrites the whole n/10-row view
      val aggChangedFiles = agg.changedEntriesAt(agg.versions.last,
        agg.versions.head).length
      val viewRows = m.read(spark).count()
      val (feedRows, feedSec) = timed(
        src.changesBetween(spark, 0L, 1L).count())
      val (_, recomputeSec) = timed(
        src.read(spark, graft.sink.DeleteMode.Hard)
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sv"),
            min(col("v")).as("mn"), max(col("v")).as("mx"))
          .write.mode("overwrite").parquet(s"$scratch/${tag}_full_$n"))
      s""""$n":{"rows":$n,"nbuckets":$nBuckets,"changed_files":$changedFiles,
         |"agg_changed_files":$aggChangedFiles,"view_rows":$viewRows,
         |"feed_rows":$feedRows,"build_sec":${num(buildSec)},
         |"refresh_sec":${num(refreshSec)},"feed_sec":${num(feedSec)},
         |"recompute_sec":${num(recomputeSec)},
         |"speedup":${num(recomputeSec / math.max(refreshSec, 1e-9))},
         |"speedup_vs_rebuild":${num(buildSec / math.max(refreshSec, 1e-9))}}"""
        .stripMargin.replaceAll("\n", "")
    }
    // two regimes: cross-key rollups (grp — exact IVM must scan the
    // snapshot once; the win is the O(changed) WRITE side, measured as
    // agg_changed_files vs view_rows) and KEYED views (groups ⊇ merge
    // keys — the recompute scan is changed-bucket-pruned too, so the
    // whole refresh is O(changed) and the wall curve stays flat)
    val rollup = mults.map(m => rung("rollup", base * m, Seq("grp")))
    val keyed = mults.map(m => rung("keyed", base * m, Seq("id", "grp")))
    println(s"""{"ivm_rollup":{${rollup.mkString(",")}},""" +
      s""""ivm_keyed":{${keyed.mkString(",")}}}""")
    graft.engine.Fs.deleteTree(new java.io.File(scratch))
    spark.stop()
  }
}
