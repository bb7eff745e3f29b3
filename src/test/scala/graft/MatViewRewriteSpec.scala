package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._
import graft.sink.{DeleteMode, MaterializedAgg, SnapshotParquetSink}

/** Materialized-view query rewrite ([[graft.plans.MatViewRewrite]]): a
  * matching GROUP BY over the SOURCE table must be answered from the
  * maintained aggregate — same rows, plan scanning only the matview dir —
  * and every near-miss (stale view, extra predicate, different aggregate,
  * missing tombstone filter) must keep the original plan and the correct
  * answer. Rewrites must respect the DSv2 scan's version pin: a DataFrame
  * resolved before the source advanced reads the matview state of ITS
  * version, not the current one.
  */
class MatViewRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def rows(t: (Int, String, Long, Long)*): DataFrame =
    t.toSeq.toDF("id", "grp", "v", "seq").withColumn("__del", lit(false))

  private def mk(tag: String): (SnapshotParquetSink, MaterializedAgg, String, String) = {
    val srcDir = tmpDir(s"mvr_${tag}_src")
    val aggDir = tmpDir(s"mvr_${tag}_agg")
    val src = new SnapshotParquetSink(srcDir, nBuckets = 4)
    val agg = new SnapshotParquetSink(aggDir, nBuckets = 4)
    val m = new MaterializedAgg(src, agg, Seq("grp"),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
    (src, m, srcDir, aggDir)
  }

  /** Every file path / table name the optimized plan scans. */
  private def scanned(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.toSeq.map(_.toUri.getPath)
        case _                   => Nil
      }
      case r: DataSourceV2ScanRelation => Seq(r.relation.table.name())
      case r: DataSourceV2Relation     => Seq(r.table.name())
    }.flatten

  private def readsOnly(df: DataFrame, dir: String): Boolean = {
    val p = scanned(df)
    p.nonEmpty && p.forall(_.contains(dir))
  }

  private def got(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def dsv2(dir: String): DataFrame =
    spark.read.format("graft-snapshot").load(dir)

  private val q = "SELECT grp, count(1) AS n, sum(v) AS sv FROM %s WHERE NOT __is_deleted GROUP BY grp"

  test("current view answers a DSv2 SQL GROUP BY from the matview") {
    val (src, m, srcDir, aggDir) = mk("sql")
    src.merge(rows((1, "a", 10, 1), (2, "a", 20, 2), (3, "b", 5, 3)),
      Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      dsv2(srcDir).createOrReplaceTempView("mvr_sql_snap")
      val out = spark.sql(q.format("mvr_sql_snap"))
      assert(readsOnly(out, aggDir), s"expected matview scan, got ${scanned(out)}")
      assert(got(out) == Set(("a", 2L, 30L), ("b", 1L, 5L)))
      // kill switch: same query, rewrite off → source scan, same rows
      spark.conf.set("spark.graft.matview.rewrite", "false")
      try {
        val off = spark.sql(q.format("mvr_sql_snap"))
        assert(readsOnly(off, srcDir), s"expected source scan, got ${scanned(off)}")
        assert(got(off) == got(out))
      } finally spark.conf.unset("spark.graft.matview.rewrite")
    } finally MaterializedAgg.unregister(m)
  }

  test("stale view keeps the source plan; a version-pinned scan still rewrites") {
    val (src, m, srcDir, aggDir) = mk("stale")
    src.merge(rows((1, "a", 10, 1), (2, "b", 20, 2)), Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      val pinnedV0 = dsv2(srcDir) // resolves (and pins) version 0
      src.merge(rows((3, "b", 7, 3)), Seq("id"), "seq", "__del") // v1, NOT refreshed
      // fresh read pins v1: the view is stale for it → source plan, v1 rows
      pinnedV0.sparkSession.catalog.clearCache()
      val fresh = dsv2(srcDir)
      fresh.createOrReplaceTempView("mvr_stale_fresh")
      val cur = spark.sql(q.format("mvr_stale_fresh"))
      assert(readsOnly(cur, srcDir), s"stale view must not answer: ${scanned(cur)}")
      assert(got(cur) == Set(("a", 1L, 10L), ("b", 2L, 27L)))
      // the v0-pinned frame still matches the view's applied version →
      // rewrite fires and returns the v0 answer (snapshot semantics)
      pinnedV0.createOrReplaceTempView("mvr_stale_v0")
      val old = spark.sql(q.format("mvr_stale_v0"))
      assert(readsOnly(old, aggDir), s"pinned scan should rewrite: ${scanned(old)}")
      assert(got(old) == Set(("a", 1L, 10L), ("b", 1L, 20L)))
      // refresh → fresh reads rewrite again, with the v1 answer
      m.refresh(spark)
      dsv2(srcDir).createOrReplaceTempView("mvr_stale_cur")
      val now = spark.sql(q.format("mvr_stale_cur"))
      assert(readsOnly(now, aggDir), s"refreshed view should answer: ${scanned(now)}")
      assert(got(now) == got(cur))
    } finally MaterializedAgg.unregister(m)
  }

  test("near-misses never rewrite and stay correct") {
    val (src, m, srcDir, aggDir) = mk("miss")
    src.merge(rows((1, "a", 10, 1), (2, "a", 20, 2), (3, "b", 5, 3)),
      Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      dsv2(srcDir).createOrReplaceTempView("mvr_miss_snap")
      // extra predicate: the view doesn't answer a filtered aggregate
      val filtered = spark.sql("SELECT grp, count(1) AS n FROM mvr_miss_snap " +
        "WHERE NOT __is_deleted AND v > 5 GROUP BY grp")
      assert(readsOnly(filtered, srcDir), s"got ${scanned(filtered)}")
      assert(filtered.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 2L)))
      // different aggregate (avg is not in the spec)
      val avg = spark.sql("SELECT grp, avg(v) AS av FROM mvr_miss_snap " +
        "WHERE NOT __is_deleted GROUP BY grp")
      assert(readsOnly(avg, srcDir), s"got ${scanned(avg)}")
      // missing tombstone filter: aggregating deletes too — must not rewrite
      val noFilter = spark.sql("SELECT grp, count(1) AS n FROM mvr_miss_snap GROUP BY grp")
      assert(readsOnly(noFilter, srcDir), s"got ${scanned(noFilter)}")
      // different grouping
      val regrouped = spark.sql("SELECT id, count(1) AS n FROM mvr_miss_snap " +
        "WHERE NOT __is_deleted GROUP BY id")
      assert(readsOnly(regrouped, srcDir), s"got ${scanned(regrouped)}")
      assert(!scanned(regrouped).exists(_.contains(aggDir)))
    } finally MaterializedAgg.unregister(m)
  }

  test("output subset, reorder and rename still rewrite") {
    val (src, m, srcDir, aggDir) = mk("shape")
    src.merge(rows((1, "a", 10, 1), (2, "b", 20, 2)), Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      dsv2(srcDir).createOrReplaceTempView("mvr_shape_snap")
      val out = spark.sql("SELECT sum(v) AS total, grp AS g FROM mvr_shape_snap " +
        "WHERE NOT __is_deleted GROUP BY grp")
      assert(readsOnly(out, aggDir), s"got ${scanned(out)}")
      assert(out.columns.toSeq == Seq("total", "g"))
      assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((10L, "a"), (20L, "b")))
    } finally MaterializedAgg.unregister(m)
  }

  test("the Scala hard-read path (V1 parquet scan) rewrites too") {
    val (src, m, srcDir, aggDir) = mk("v1")
    src.merge(rows((1, "a", 10, 1), (2, "a", 20, 2), (3, "b", 5, 3)),
      Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      val out = src.read(spark, DeleteMode.Hard)
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(readsOnly(out, aggDir), s"expected matview scan, got ${scanned(out)}")
      assert(got(out) == Set(("a", 2L, 30L), ("b", 1L, 5L)))
      // unregistered → source plan again
      MaterializedAgg.unregister(m)
      val plain = src.read(spark, DeleteMode.Hard)
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(readsOnly(plain, srcDir), s"got ${scanned(plain)}")
      assert(got(plain) == got(out))
    } finally MaterializedAgg.unregister(m)
  }

  // ----------------------------------------------------------- roll-ups

  private def rows2(t: (Int, String, String, Long, Long)*): DataFrame =
    t.toSeq.toDF("id", "grp", "sub", "v", "seq").withColumn("__del", lit(false))

  private def mk2(tag: String): (SnapshotParquetSink, MaterializedAgg, String, String) = {
    val srcDir = tmpDir(s"mvr_${tag}_src")
    val aggDir = tmpDir(s"mvr_${tag}_agg")
    val src = new SnapshotParquetSink(srcDir, nBuckets = 4)
    val agg = new SnapshotParquetSink(aggDir, nBuckets = 4)
    val m = new MaterializedAgg(src, agg, Seq("grp", "sub"),
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx")))
    (src, m, srcDir, aggDir)
  }

  test("subset grouping rolls up from the view: sum/min/max/count re-fold") {
    val (src, m, srcDir, aggDir) = mk2("rollup")
    src.merge(rows2((1, "a", "x", 10, 1), (2, "a", "y", 20, 2),
      (3, "b", "x", 5, 3), (4, "b", "x", 7, 4)), Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      dsv2(srcDir).createOrReplaceTempView("mvr_rollup_snap")
      val out = spark.sql("SELECT grp, count(1) AS n, sum(v) AS sv, min(v) AS mn, " +
        "max(v) AS mx FROM mvr_rollup_snap WHERE NOT __is_deleted GROUP BY grp")
      assert(readsOnly(out, aggDir), s"expected roll-up from matview: ${scanned(out)}")
      assert(out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet ==
        Set(("a", 2L, 30L, 10L, 20L), ("b", 2L, 12L, 5L, 7L)))
      // grand total: empty grouping is the extreme subset
      val total = spark.sql("SELECT count(1) AS n, sum(v) AS sv FROM mvr_rollup_snap " +
        "WHERE NOT __is_deleted")
      assert(readsOnly(total, aggDir), s"got ${scanned(total)}")
      assert(total.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((4L, 42L)))
      // group-cols-only subset: a distinct projection of the view
      val keys = spark.sql("SELECT grp FROM mvr_rollup_snap WHERE NOT __is_deleted " +
        "GROUP BY grp")
      assert(readsOnly(keys, aggDir), s"got ${scanned(keys)}")
      assert(keys.collect().map(_.getString(0)).toSet == Set("a", "b"))
      // non-decomposable aggregates must NOT roll up
      val dist = spark.sql("SELECT grp, count(DISTINCT v) AS nd FROM mvr_rollup_snap " +
        "WHERE NOT __is_deleted GROUP BY grp")
      assert(readsOnly(dist, srcDir), s"distinct must not re-fold: ${scanned(dist)}")
      assert(dist.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("a", 2L), ("b", 2L)))
    } finally MaterializedAgg.unregister(m)
  }

  test("avg decomposes from sum(x) + count(x), exact and rolled up") {
    val srcDir = tmpDir("mvr_avg_src")
    val aggDir = tmpDir("mvr_avg_agg")
    val src = new SnapshotParquetSink(srcDir, nBuckets = 4)
    val agg = new SnapshotParquetSink(aggDir, nBuckets = 4)
    // count(v) — the NON-NULL count avg needs — not count(1)
    val m = new MaterializedAgg(src, agg, Seq("grp", "sub"),
      Seq(sum(col("v")).as("sv"), count(col("v")).as("nv")))
    src.merge(rows2((1, "a", "x", 10, 1), (2, "a", "y", 20, 2),
      (3, "b", "x", 5, 3), (4, "b", "x", 6, 4)), Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      dsv2(srcDir).createOrReplaceTempView("mvr_avg_snap")
      // exact grouping: avg = sv / nv per view row
      val exact = spark.sql("SELECT grp, sub, avg(v) AS av FROM mvr_avg_snap " +
        "WHERE NOT __is_deleted GROUP BY grp, sub")
      assert(readsOnly(exact, aggDir), s"got ${scanned(exact)}")
      assert(exact.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet ==
        Set(("a", "x", 10.0), ("a", "y", 20.0), ("b", "x", 5.5)))
      // roll-up: avg = sum(sv) / sum(nv)
      val rolled = spark.sql("SELECT grp, avg(v) AS av FROM mvr_avg_snap " +
        "WHERE NOT __is_deleted GROUP BY grp")
      assert(readsOnly(rolled, aggDir), s"got ${scanned(rolled)}")
      assert(rolled.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
        Set(("a", 15.0), ("b", 5.5)))
    } finally MaterializedAgg.unregister(m)
  }

  test("grand-total count over a view with zero live groups is 0, not null") {
    val (src, m, srcDir, aggDir) = mk2("empty")
    src.merge(rows2((1, "a", "x", 10, 1), (2, "b", "y", 20, 2)),
      Seq("id"), "seq", "__del")
    m.refresh(spark)
    // delete EVERYTHING: the view stays current but has zero live groups
    src.merge(Seq((1, 3L), (2, 4L)).toDF("id", "seq")
      .withColumn("grp", lit(null).cast("string"))
      .withColumn("sub", lit(null).cast("string"))
      .withColumn("v", lit(0L))
      .withColumn("__del", lit(true))
      .select("id", "grp", "sub", "v", "seq", "__del"), Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      dsv2(srcDir).createOrReplaceTempView("mvr_empty_snap")
      val total = spark.sql("SELECT count(1) AS n FROM mvr_empty_snap " +
        "WHERE NOT __is_deleted")
      assert(readsOnly(total, aggDir), s"got ${scanned(total)}")
      assert(total.collect().map(_.getLong(0)).toSeq == Seq(0L))
    } finally MaterializedAgg.unregister(m)
  }

  test("a V1 frame resolved before the source advanced rewrites to ITS version") {
    val (src, m, srcDir, aggDir) = mk("v1pin")
    src.merge(rows((1, "a", 10, 1), (2, "b", 20, 2)), Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      // file list resolves NOW, at v0
      val pinned = src.read(spark, DeleteMode.Hard)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      // source AND view advance before the pinned frame is optimized/run
      src.merge(rows((3, "a", 7, 3)), Seq("id"), "seq", "__del")
      m.refresh(spark)
      // the rewrite must serve the view state matching the frame's v0 file
      // list — substituting "current" would silently change the answer
      assert(readsOnly(pinned, aggDir), s"got ${scanned(pinned)}")
      assert(got(pinned) == Set(("a", 1L, 10L), ("b", 1L, 20L)))
      val fresh = src.read(spark, DeleteMode.Hard)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      assert(readsOnly(fresh, aggDir), s"got ${scanned(fresh)}")
      assert(got(fresh) == Set(("a", 2L, 17L), ("b", 1L, 20L)))
    } finally MaterializedAgg.unregister(m)
  }

  test("SQL-only flow: matagg_define / matview_refresh / matview_unregister") {
    val srcDir = tmpDir("mvr_tvf_src")
    val aggDir = tmpDir("mvr_tvf_agg")
    // source writes through the DSv2 writer — no Scala sink API anywhere
    rows((1, "a", 10, 1), (2, "b", 20, 2)).write.format("graft-snapshot")
      .option("keys", "id").option("deleteCol", "__del")
      .mode("append").save(srcDir)
    val defined = spark.sql(s"SELECT * FROM matagg_define('$srcDir', '$aggDir', " +
      "'grp', 'count(1) AS n; sum(v) AS sv')").collect()
    try {
      assert(defined.map(r => (r.getString(1), r.getLong(2))).toSeq ==
        Seq((aggDir, 0L)))
      dsv2(srcDir).createOrReplaceTempView("mvr_tvf_snap")
      val out = spark.sql(q.format("mvr_tvf_snap"))
      assert(readsOnly(out, aggDir), s"got ${scanned(out)}")
      assert(got(out) == Set(("a", 1L, 10L), ("b", 1L, 20L)))
      // source advances through the same writer: the view is stale until
      // matview_refresh, and fresh reads fall back to the source meanwhile
      rows((3, "a", 7, 3)).write.format("graft-snapshot")
        .mode("append").save(srcDir) // keys recorded in the manifest
      dsv2(srcDir).createOrReplaceTempView("mvr_tvf_snap2")
      val stale = spark.sql(q.format("mvr_tvf_snap2"))
      assert(readsOnly(stale, srcDir), s"got ${scanned(stale)}")
      val refreshed = spark.sql(s"SELECT * FROM matview_refresh('$srcDir')").collect()
      assert(refreshed.head.getLong(2) == 1L)
      val now = spark.sql(q.format("mvr_tvf_snap2"))
      assert(readsOnly(now, aggDir), s"got ${scanned(now)}")
      assert(got(now) == Set(("a", 2L, 17L), ("b", 1L, 20L)))
    } finally {
      spark.sql(s"SELECT * FROM matview_unregister('$srcDir')").collect()
      ()
    }
    val after = spark.sql(q.format("mvr_tvf_snap2"))
    assert(readsOnly(after, srcDir), s"got ${scanned(after)}")
  }

  test("rewritten output composes with parent operators (having, order, join)") {
    val (src, m, srcDir, aggDir) = mk("parent")
    src.merge(rows((1, "a", 10, 1), (2, "a", 20, 2), (3, "b", 5, 3), (4, "c", 9, 4)),
      Seq("id"), "seq", "__del")
    m.refresh(spark)
    MaterializedAgg.register(m)
    try {
      dsv2(srcDir).createOrReplaceTempView("mvr_parent_snap")
      val out = spark.sql("SELECT grp, n, sv FROM (" + q.format("mvr_parent_snap") +
        ") WHERE sv >= 9 ORDER BY sv DESC")
      assert(scanned(out).nonEmpty && scanned(out).forall(_.contains(aggDir)),
        s"got ${scanned(out)}")
      assert(out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
        Seq(("a", 2L, 30L), ("c", 1L, 9L)))
    } finally MaterializedAgg.unregister(m)
  }
}
