package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.{DeleteMode, MaterializedAgg, MaterializedJoin, SnapshotParquetSink, ViewSpecs}

/** Durable view definitions ([[graft.sink.ViewSpecs]]): a maintained view's
  * spec persisted into its own table dir must rehydrate in a fresh handle —
  * a different "process" — and keep maintaining (and rewriting) exactly the
  * same view; double definition refuses.
  */
class ViewSpecsSpec extends SparkSpec {

  import spark.implicits._

  private def rows(t: (Int, String, Long, Long)*): DataFrame =
    t.toSeq.toDF("id", "grp", "v", "seq").withColumn("__del", lit(false))

  test("agg view round-trips: define, advance source, load elsewhere, refresh") {
    val srcDir = tmpDir("vspec_src")
    val aggDir = tmpDir("vspec_agg") + "/view"
    val src = new SnapshotParquetSink(srcDir, nBuckets = 4)
    src.merge(rows((1, "a", 10, 1), (2, "b", 20, 2)), Seq("id"), "seq", "__del")
    val m = new MaterializedAgg(src, new SnapshotParquetSink(aggDir, 4),
      Seq("grp"), Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
    ViewSpecs.saveAgg(m, Seq("count(1) AS n", "sum(v) AS sv"))
    m.refresh(spark)
    // source advances after the defining process is gone
    src.merge(rows((3, "a", 7, 3)), Seq("id"), "seq", "__del")
    // a fresh process rehydrates from the spec alone and catches up
    val loaded = ViewSpecs.load(spark, aggDir).asInstanceOf[MaterializedAgg]
    assert(loaded.source.dir == srcDir)
    loaded.refreshIfReady(spark)
    val got = loaded.read(spark).select("grp", "n", "sv")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 2L, 17L), ("b", 1L, 20L)))
    // redefinition refuses: the spec is immutable metadata
    val e = intercept[IllegalArgumentException] {
      ViewSpecs.saveAgg(m, Seq("count(1) AS n"))
    }
    assert(e.getMessage.contains("already defined"))
  }

  test("join view round-trips through its persisted definition") {
    val base = tmpDir("vspec_join")
    val f = new SnapshotParquetSink(s"$base/f", 4)
    val d = new SnapshotParquetSink(s"$base/d", 4)
    f.merge(Seq((1, "a", 10L, 1L), (2, "b", 5L, 2L)).toDF("id", "ck", "v", "seq")
      .withColumn("fdel", lit(false)), Seq("id"), "seq", "fdel")
    d.merge(Seq(("a", "Acme", 1L), ("b", "Bolt", 2L)).toDF("ck", "cname", "seq")
      .withColumn("ddel", lit(false)), Seq("ck"), "seq", "ddel")
    val m = new MaterializedJoin(f, d, new SnapshotParquetSink(s"$base/view", 4),
      Seq("ck"), Seq("cname"))
    ViewSpecs.saveJoin(m, Seq("ck"), Seq("cname"), "left_outer")
    m.refresh(spark)
    d.merge(Seq(("a", "Acme Corp", 3L)).toDF("ck", "cname", "seq")
      .withColumn("ddel", lit(false)), Seq("ck"), "seq", "ddel")
    val loaded = ViewSpecs.load(spark, s"$base/view").asInstanceOf[MaterializedJoin]
    loaded.refreshIfReady(spark)
    val got = loaded.read(spark).select("id", "cname")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "Acme Corp"), (2, "Bolt")))
  }

  test("SQL-only lifecycle: matagg_define persists, matview_load refreshes anywhere") {
    val srcDir = tmpDir("vspec_sql_src")
    val aggDir = tmpDir("vspec_sql_agg") + "/view"
    rows((1, "a", 10, 1), (2, "b", 20, 2)).write.format("graft-snapshot")
      .option("keys", "id").option("deleteCol", "__del")
      .mode("append").save(srcDir)
    spark.sql(s"SELECT * FROM matagg_define('$srcDir', '$aggDir', 'grp', " +
      "'count(1) AS n; sum(v) AS sv')").collect()
    try {
      assert(ViewSpecs.defined(aggDir))
      // "new process": drop the in-memory registration, advance the source,
      // then matview_load alone must refresh AND re-enable the rewrite
      MaterializedAgg.registered(srcDir).foreach(MaterializedAgg.unregister)
      rows((3, "a", 7, 3)).write.format("graft-snapshot")
        .mode("append").save(srcDir)
      val status = spark.sql(s"SELECT * FROM matview_load('$aggDir')").collect()
      assert(status.head.getLong(2) == 1L) // applied = source v1
      spark.read.format("graft-snapshot").load(srcDir)
        .createOrReplaceTempView("vspec_sql_snap")
      val out = spark.sql("SELECT grp, count(1) AS n, sum(v) AS sv FROM " +
        "vspec_sql_snap WHERE NOT __is_deleted GROUP BY grp")
      val scans = out.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.toSeq.map(_.toUri.getPath)
            case _ => Nil
          }
        case o => Seq(o.nodeName)
      }
      assert(scans.nonEmpty && scans.forall(_.startsWith(aggDir)),
        s"loaded view should rewrite: $scans")
      assert(out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
        Set(("a", 2L, 17L), ("b", 1L, 20L)))
      // re-define with identical args: idempotent no-op
      spark.sql(s"SELECT * FROM matagg_define('$srcDir', '$aggDir', 'grp', " +
        "'count(1) AS n; sum(v) AS sv')").collect()
      // divergent args must refuse — the stored spec is authoritative
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM matagg_define('$srcDir', '$aggDir', 'grp', " +
          "'count(1) AS n; max(v) AS sv')").collect()
      }
      assert(e.getMessage.contains("DIFFERENTLY"), e.getMessage)
    } finally {
      MaterializedAgg.registered(srcDir).foreach(MaterializedAgg.unregister)
      ()
    }
  }
}
