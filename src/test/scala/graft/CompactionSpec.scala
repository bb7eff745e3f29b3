package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.engine.Dfs
import graft.sink.Compaction

/** Small-file compaction: report-first lifecycle contract on a
  * directory-partitioned table — dry run touches nothing (crash residue is
  * planned through a read-only scratch overlay, so preview == executed
  * plan), a real run repairs then rewrites exactly the over-fragmented
  * partitions to their target file count with content preserved, a second
  * run is a no-op, and scratch directories never survive a real run.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  /** dt-partitioned table: partition a fragmented into `filesA` files,
    * partition b into one.
    */
  private def fragmented(filesA: Int): String = {
    val dir = tmpDir("compact") + "/t"
    (1 to 60).map(i => (i.toLong, s"v$i", "a")).toDF("id", "v", "dt")
      .repartition(filesA)
      .write.partitionBy("dt").parquet(dir)
    Seq((100L, "b1", "b")).toDF("id", "v", "dt")
      .write.mode("append").partitionBy("dt").parquet(dir)
    dir
  }

  private def dataFiles(dir: String, part: String): Long =
    Dfs.list(new Path(dir, part)).count(s => s.isFile && !s.getPath.getName.startsWith("_"))

  test("dry run reports the fragmented partition and touches nothing") {
    val dir = fragmented(filesA = 5)
    val report = Compaction.compactPartitions(spark, dir, "dt", targetBytes = 1L << 30)
    assert(!report.executed)
    assert(report.compacted.map(_.value) == Seq("a"))
    assert(report.compacted.head.filesBefore == 5 && report.compacted.head.targetFiles == 1)
    assert(report.skipped == Seq("b"))
    assert(dataFiles(dir, "dt=a") == 5) // untouched
  }

  test("real run rewrites to target, preserves content, and is idempotent") {
    val dir = fragmented(filesA = 5)
    val before = spark.read.parquet(dir).groupBy("dt").agg(sum("id"), count(lit(1)))
      .collect().map(_.toSeq).toSet
    val report = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = 1L << 30, dryRun = false)
    assert(report.executed && report.filesBefore == 5 && report.filesAfter == 1)
    assert(dataFiles(dir, "dt=a") == 1 && dataFiles(dir, "dt=b") == 1)
    val after = spark.read.parquet(dir).groupBy("dt").agg(sum("id"), count(lit(1)))
      .collect().map(_.toSeq).toSet
    assert(after == before)
    // no scratch leftovers: the sibling scratch root is gone entirely
    assert(!Dfs.exists(new Path(dir + ".compact_scratch")))
    // already-compacted table: nothing to do, everything skipped
    val again = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = 1L << 30, dryRun = false)
    assert(again.compacted.isEmpty && again.skipped == Seq("a", "b"))
  }

  test("recovers a crash mid-swap: partition aside in scratch is restored") {
    val dir = fragmented(filesA = 5)
    val before = spark.read.parquet(dir).count()
    // simulate the worst crash window: partition renamed aside, rewrite
    // never landed — the original lives ONLY in scratch
    val scratch = new Path(dir + ".compact_scratch")
    assert(Dfs.fs(scratch).mkdirs(scratch))
    Dfs.rename(new Path(dir, "dt=a"), new Path(scratch, "old_a"))
    assert(spark.read.parquet(dir).count() < before)
    val report = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = 1L << 30, dryRun = false)
    // recovery restored dt=a, then the pass compacted it as usual
    assert(report.compacted.map(_.value) == Seq("a"))
    assert(spark.read.parquet(dir).count() == before)
    assert(!Dfs.exists(scratch))
  }

  test("recovery clears post-swap garbage without touching the live partition") {
    val dir = fragmented(filesA = 3)
    val scratch = new Path(dir + ".compact_scratch")
    assert(Dfs.fs(scratch).mkdirs(scratch))
    // crash after swap-in, before cleanup: live partition + stale old_ copy
    Seq((999L, "stale", "a")).toDF("id", "v", "dt")
      .write.parquet(new Path(scratch, "old_a").toString)
    Compaction.recover(dir, "dt")
    assert(!Dfs.exists(new Path(scratch, "old_a")))
    val ids = spark.read.parquet(dir).filter(col("dt") === "a")
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(999L) && ids.size == 60)
  }

  test("post-crash dry run previews the FULL plan without touching anything") {
    val dir = fragmented(filesA = 5)
    val before = spark.read.parquet(dir).count()
    // crash window: dt=a renamed aside, rewrite never landed
    val scratch = new Path(dir + ".compact_scratch")
    assert(Dfs.fs(scratch).mkdirs(scratch))
    Dfs.rename(new Path(dir, "dt=a"), new Path(scratch, "old_a"))
    val preview = Compaction.compactPartitions(spark, dir, "dt", targetBytes = 1L << 30)
    // the preview plans the crashed partition FROM SCRATCH (read-only
    // overlay) — same plan a real run would execute (q61f invariant)...
    assert(!preview.executed && preview.compacted.map(_.value) == Seq("a"))
    // ...while mutating nothing: residue still in scratch, live still short
    assert(Dfs.exists(new Path(scratch, "old_a")))
    assert(spark.read.parquet(dir).count() < before)
    // the real run repairs, then executes exactly the previewed plan
    val report = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = 1L << 30, dryRun = false)
    assert(report.compacted == preview.compacted)
    assert(spark.read.parquet(dir).count() == before)
    assert(!Dfs.exists(scratch))
  }

  test("executed filesAfter is measured from the swapped-in partitions") {
    val dir = fragmented(filesA = 5)
    val report = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = 1L << 30, dryRun = false)
    assert(report.measuredFilesAfter.contains(dataFiles(dir, "dt=a")))
    // dry run has no measurement — filesAfter falls back to the plan
    val dry = Compaction.compactPartitions(spark, dir, "dt", targetBytes = 1L << 30)
    assert(dry.measuredFilesAfter.isEmpty)
  }

  test("trailing slash on the table dir keeps scratch OUTSIDE the table") {
    val dir = fragmented(filesA = 4)
    val report = Compaction.compactPartitions(spark, dir + "/", "dt",
      targetBytes = 1L << 30, dryRun = false)
    assert(report.compacted.map(_.value) == Seq("a"))
    assert(dataFiles(dir, "dt=a") == 1)
    // no scratch residue inside OR beside the table
    assert(!Dfs.exists(new Path(dir, ".compact_scratch")))
    assert(!Dfs.exists(new Path(dir + ".compact_scratch")))
    // partition discovery still clean: only dt=a / dt=b
    assert(spark.read.parquet(dir).select("dt").distinct().count() == 2)
  }

  test("concurrent rewrites: many fragmented partitions compact in one pass") {
    // exercises the bounded-pool path with more candidates than threads
    val dir = tmpDir("compact_par") + "/t"
    val rows = for (p <- 'a' to 'f'; i <- 1 to 40)
      yield (i.toLong + p, s"v$i", p.toString)
    rows.toDF("id", "v", "dt").repartition(5)
      .write.partitionBy("dt").parquet(dir)
    val before = spark.read.parquet(dir).groupBy("dt")
      .agg(sum("id"), count(lit(1))).collect().map(_.toSeq).toSet
    val report = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = 1L << 30, dryRun = false)
    assert(report.compacted.map(_.value) == ('a' to 'f').map(_.toString))
    ('a' to 'f').foreach(p => assert(dataFiles(dir, s"dt=$p") == 1))
    assert(report.measuredFilesAfter.contains(6L))
    val after = spark.read.parquet(dir).groupBy("dt")
      .agg(sum("id"), count(lit(1))).collect().map(_.toSeq).toSet
    assert(after == before)
    assert(!Dfs.exists(new Path(dir + ".compact_scratch")))
  }

  test("content fingerprint: order-insensitive, multiplicity-sensitive") {
    import Compaction.contentFingerprint
    def write(rows: Seq[(Long, String)], parts: Int): Path = {
      val d = new Path(tmpDir("fp"), "t")
      rows.toDF("id", "v").repartition(parts).write.mode("overwrite").parquet(d.toString)
      d
    }
    val base = Seq((1L, "a"), (1L, "a"), (2L, "b"))
    // same rows, different file layout and order → same fingerprint
    assert(contentFingerprint(spark, write(base, 1)) ==
      contentFingerprint(spark, write(base.reverse, 3)))
    // {A,A}→{B,B}: even-multiplicity corruption an XOR check cannot see
    val swapped = Seq((9L, "z"), (9L, "z"), (2L, "b"))
    assert(contentFingerprint(spark, write(base, 1)) !=
      contentFingerprint(spark, write(swapped, 1)))
    // duplicate-shift at equal count: {A,A,B} vs {A,B,B}
    val shifted = Seq((1L, "a"), (2L, "b"), (2L, "b"))
    assert(contentFingerprint(spark, write(base, 1)) !=
      contentFingerprint(spark, write(shifted, 1)))
    // empty directory is a defined fingerprint, not an NPE
    assert(contentFingerprint(spark, write(base.take(0), 1))._1 == 0L)
  }

  test("content fingerprint handles MAP columns: entry-order-insensitive, content-sensitive") {
    import Compaction.contentFingerprint
    // Spark's hash functions reject MapType outright — before the
    // canonicalization this threw AnalysisException on ANY map-bearing
    // table, so a real compaction run would fail where count-only passed
    def write(df: org.apache.spark.sql.DataFrame): Path = {
      val d = new Path(tmpDir("fpmap"), "t")
      df.write.mode("overwrite").parquet(d.toString)
      d
    }
    val fwd = Seq(1L).toDF("id").select(col("id"),
      map(lit("a"), lit(1), lit("b"), lit(2)).as("m"),
      struct(map(lit("x"), array(lit(7))).as("inner")).as("s")) // nested map too
    val rev = Seq(1L).toDF("id").select(col("id"),
      map(lit("b"), lit(2), lit("a"), lit(1)).as("m"),
      struct(map(lit("x"), array(lit(7))).as("inner")).as("s"))
    // same content, different insertion order → same fingerprint
    assert(contentFingerprint(spark, write(fwd)) == contentFingerprint(spark, write(rev)))
    // a changed VALUE inside the map must change the fingerprint
    val changed = Seq(1L).toDF("id").select(col("id"),
      map(lit("a"), lit(1), lit("b"), lit(99)).as("m"),
      struct(map(lit("x"), array(lit(7))).as("inner")).as("s"))
    assert(contentFingerprint(spark, write(fwd)) != contentFingerprint(spark, write(changed)))
    // null map and null struct survive (and differ from struct-of-nulls)
    val nulls = Seq(1L).toDF("id").select(col("id"),
      lit(null).cast("map<string,int>").as("m"),
      lit(null).cast("struct<inner:map<string,array<int>>>").as("s"))
    assert(contentFingerprint(spark, write(nulls)) != contentFingerprint(spark, write(fwd)))
  }

  test("real compaction run succeeds on a map-bearing table") {
    val dir = tmpDir("compact_map") + "/t"
    (1 to 60).map(i => (i.toLong, "a")).toDF("id", "dt")
      .select(col("id"), map(lit("k"), col("id")).as("props"), col("dt"))
      .repartition(5).write.partitionBy("dt").parquet(dir)
    val before = spark.read.parquet(dir).select(sum(element_at(col("props"), "k")))
      .head().getLong(0)
    val report = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = 1L << 30, dryRun = false)
    assert(report.executed && report.compacted.map(_.value) == Seq("a"))
    assert(dataFiles(dir, "dt=a") == 1)
    assert(spark.read.parquet(dir).select(sum(element_at(col("props"), "k")))
      .head().getLong(0) == before)
  }

  test("bytes-proportional target splits a large partition into several files") {
    val dir = fragmented(filesA = 8)
    val (_, bytesA) = Dfs.contentSummary(new Path(dir, "dt=a"))
    // target a third of the partition: ceil gives 3 or 4 files, always >1 and <8
    val target = bytesA / 3
    val report = Compaction.compactPartitions(spark, dir, "dt",
      targetBytes = target, dryRun = false)
    val planA = report.compacted.find(_.value == "a").get
    assert(planA.targetFiles > 1 && planA.targetFiles < 8)
    assert(dataFiles(dir, "dt=a") == planA.targetFiles)
  }
}
