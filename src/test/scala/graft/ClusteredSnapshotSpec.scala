package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.{DeleteMode, SnapshotParquetSink}
import graft.sink.SnapshotParquetSink.ClusterCol

/** Write-time Z-order clustering in the snapshot sink: buckets become
  * Z-tiles of the cluster columns, so the manifest's per-bucket min/max
  * stats carry TIGHT rectangles and 2-D range predicates prune to the few
  * tiles they intersect — the pruning the hash layout can only deliver for
  * commit-correlated columns.
  */
class ClusteredSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Seq(ClusterCol("x", 0L, 31L), ClusterCol("y", 0L, 31L))

  /** 32×32 grid keyed by (x, y) — with 16 buckets each Z-tile is an 8×8
    * square of the grid.
    */
  private def grid: DataFrame =
    (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y, 0L, s"v$x-$y", false))
      .toDF("x", "y", "seq", "val", "is_delete")

  private def scanFiles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.length
        }
    }.sum
  }

  test("2-D range predicates prune to the Z-tiles they intersect") {
    val dir = tmpDir("zsnap") + "/t"
    val sink = new SnapshotParquetSink(dir, nBuckets = 16,
      statsCols = Seq("x", "y"), clusterBy = spec)
    sink.merge(grid, Seq("x", "y"), "seq", "is_delete")

    val t = spark.read.format("graft-snapshot").load(dir)
    assert(scanFiles(t) == 16, "full scan reads every tile")

    // one quadrant-of-quadrant rectangle = exactly one 8×8 Z-tile
    val rect = t.filter($"x" <= 7L && $"y" <= 7L)
    assert(scanFiles(rect) == 1, s"8×8 rectangle must plan 1 tile, got ${scanFiles(rect)}")
    assert(rect.count() == 64L)

    // a slab pinned in ONE dimension prunes on that dimension alone —
    // the property a plain sort gives only its leading column
    val slabX = t.filter($"x" <= 7L)
    assert(scanFiles(slabX) == 4, s"x-slab must plan 4 tiles, got ${scanFiles(slabX)}")
    assert(slabX.count() == 8L * 32L)
    val slabY = t.filter($"y" >= 24L)
    assert(scanFiles(slabY) == 4, s"y-slab must plan 4 tiles, got ${scanFiles(slabY)}")

    // point equality routes straight to its tile (cluster routing, not hash)
    val pt = t.filter($"x" === 5L && $"y" === 9L)
    assert(scanFiles(pt) == 1)
    assert(pt.select("val").head.getString(0) == "v5-9")

    // results identical to the unpruned read
    val expect = sink.read(spark, DeleteMode.Hard)
      .filter($"x" <= 7L && $"y" <= 7L).select("val")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(rect.select("val").collect().map(_.getString(0)).sorted.toSeq == expect)
  }

  test("hash layout cannot prune the same rectangle — the clustering payoff") {
    val dir = tmpDir("hsnap") + "/t"
    val sink = new SnapshotParquetSink(dir, nBuckets = 16, statsCols = Seq("x", "y"))
    sink.merge(grid, Seq("x", "y"), "seq", "is_delete")
    val t = spark.read.format("graft-snapshot").load(dir)
    val rect = t.filter($"x" <= 7L && $"y" <= 7L)
    // keys hash-scatter: nearly every bucket spans nearly the full range
    assert(scanFiles(rect) >= 8, s"hash layout should barely prune, got ${scanFiles(rect)}")
    assert(rect.count() == 64L)
  }

  test("merges route per Z-tile; lookup and incremental rewrite stay tile-local") {
    val dir = tmpDir("zmrg") + "/t"
    val sink = new SnapshotParquetSink(dir, nBuckets = 16,
      statsCols = Seq("x", "y"), clusterBy = spec)
    sink.merge(grid, Seq("x", "y"), "seq", "is_delete")
    val v0Entries = SnapshotParquetSink.manifest(dir, 0L)._2
    // an update inside one tile touches exactly one bucket entry
    sink.merge(Seq((3L, 4L, 1L, "UPDATED", false))
      .toDF("x", "y", "seq", "val", "is_delete"), Seq("x", "y"), "seq", "is_delete")
    val v1Entries = SnapshotParquetSink.manifest(dir, 1L)._2
    val changed = v1Entries.filter { case (b, rel) => v0Entries.get(b) != Some(rel) }
    assert(changed.size == 1, s"one tile rewritten, got ${changed.keys}")
    // point lookup routes by the cluster function, not the key hash
    val row = sink.lookup(spark, Seq("x", "y"), Seq(3L, 4L)).collect()
    assert(row.length == 1 && row.head.getAs[String]("val") == "UPDATED")
    assert(sink.lookup(spark, Seq("x", "y"), Seq(3L, 5L)).head.getAs[String]("val") == "v3-5")
  }

  test("driver routing == write-path routing at clamp edges, negatives and nulls") {
    val dir = tmpDir("zagree") + "/t"
    val sink = new SnapshotParquetSink(dir, nBuckets = 16,
      clusterBy = spec)
    // adversarial key values: in-range, at-bounds, out-of-bounds both
    // directions (clamp), and a NULL cluster key (routes as lo)
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (0L, 0L), (31L, 31L), (15L, 16L),
      (-5L, 2L), (99L, 31L), (7L, -1L), (40L, 90L),
      (null, 9L), (3L, null))
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("x", LongType, nullable = true),
      StructField("y", LongType, nullable = true),
      StructField("seq", LongType, nullable = false),
      StructField("val", StringType, nullable = false),
      StructField("is_delete", BooleanType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.zipWithIndex.map { case ((x, y), i) =>
        org.apache.spark.sql.Row(x, y, i.toLong, s"r$i", false) }, 2), schema)
    sink.merge(df, Seq("x", "y"), "seq", "is_delete")
    // every stored row's actual file location must equal the DRIVER-side
    // routing of its key values — the bit-identity lookup depends on
    val placed = sink.read(spark, graft.sink.DeleteMode.Hard)
      .withColumn("file", org.apache.spark.sql.functions.input_file_name())
      .collect()
    assert(placed.length == rows.length)
    placed.foreach { r =>
      val file = r.getAs[String]("file")
      val actual = file.split("__bucket=")(1).split("/")(0).toInt
      val expect = SnapshotParquetSink.clusterBucketFor(
        Seq(Option(r.getAs[java.lang.Long]("x")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("y")).map(_.toLong)),
        spec, 16)
      assert(actual == expect, s"row ${r.getAs[String]("val")}: file bucket " +
        s"$actual != driver route $expect")
    }
  }

  test("DSv2 writes self-align to the committed cluster spec") {
    val dir = tmpDir("zw") + "/t"
    val sink = new SnapshotParquetSink(dir, nBuckets = 16,
      statsCols = Seq("x", "y"), clusterBy = spec)
    sink.merge(grid, Seq("x", "y"), "seq", "is_delete")
    // a SQL writer names no cluster spec — it must pick up the committed
    // one (hash routing here would scatter the key into the wrong tile)
    Seq((3L, 4L, 7L, "SQLW", false)).toDF("x", "y", "seq", "val", "is_delete")
      .write.format("graft-snapshot").mode("append").save(dir)
    assert(sink.lookup(spark, Seq("x", "y"), Seq(3L, 4L))
      .head.getAs[String]("val") == "SQLW")
    assert(sink.read(spark, DeleteMode.Hard).count() == 1024L)
  }

  test("rebucket on a clustered table refines the tiles; routing and pruning stay correct") {
    val dir = tmpDir("zrebkt") + "/t"
    val sink = new SnapshotParquetSink(dir, nBuckets = 16,
      statsCols = Seq("x", "y"), clusterBy = spec)
    sink.merge(grid, Seq("x", "y"), "seq", "is_delete")
    val v = sink.rebucket(spark, 64)
    assert(SnapshotParquetSink.manifestCluster(dir, v) == spec)
    assert(SnapshotParquetSink.manifest(dir, v)._1 == 64)
    val t = spark.read.format("graft-snapshot").load(dir)
    val rect = t.filter($"x" <= 7L && $"y" <= 7L)
    // 64 tiles = 4×4 grid cells per old tile: the same rectangle now spans
    // 4 finer tiles instead of 1 coarser one — still a tiny fraction
    assert(rect.count() == 64L)
    assert(scanFiles(rect) == 4, s"got ${scanFiles(rect)}")
    // a new 64-bucket handle merges and looks up through the refined layout
    val wide = new SnapshotParquetSink(dir, nBuckets = 64,
      statsCols = Seq("x", "y"), clusterBy = spec)
    wide.merge(Seq((3L, 4L, 5L, "U2", false)).toDF("x", "y", "seq", "val", "is_delete"),
      Seq("x", "y"), "seq", "is_delete")
    assert(wide.lookup(spark, Seq("x", "y"), Seq(3L, 4L))
      .head.getAs[String]("val") == "U2")
    // clustered tables need power-of-two counts — rebucket enforces it too
    intercept[IllegalArgumentException](wide.rebucket(spark, 48))
  }

  test("cluster spec is committed layout: mismatched handles refuse; compaction carries it") {
    val dir = tmpDir("zguard") + "/t"
    val sink = new SnapshotParquetSink(dir, nBuckets = 16,
      statsCols = Seq("x", "y"), clusterBy = spec)
    sink.merge(grid, Seq("x", "y"), "seq", "is_delete")
    // a hash-routing handle would scatter keys across the Z layout — refuse
    val plain = new SnapshotParquetSink(dir, nBuckets = 16)
    val e = intercept[IllegalArgumentException](
      plain.merge(Seq((0L, 0L, 9L, "z", false)).toDF("x", "y", "seq", "val", "is_delete"),
        Seq("x", "y"), "seq", "is_delete"))
    assert(e.getMessage.contains("clusterBy"))
    // ... as would different bounds
    val rebound = new SnapshotParquetSink(dir, nBuckets = 16,
      clusterBy = Seq(ClusterCol("x", 0L, 63L), ClusterCol("y", 0L, 63L)))
    intercept[IllegalArgumentException](
      rebound.merge(Seq((0L, 0L, 9L, "z", false)).toDF("x", "y", "seq", "val", "is_delete"),
        Seq("x", "y"), "seq", "is_delete"))
    // compaction rewrites files, never the routing: spec carries, pruning holds
    sink.compact(spark)
    assert(SnapshotParquetSink.manifestCluster(dir,
      sink.currentVersion.get) == spec)
    val t = spark.read.format("graft-snapshot").load(dir)
    val rect = t.filter($"x" <= 7L && $"y" <= 7L)
    assert(scanFiles(rect) == 1 && rect.count() == 64L)
    // cluster columns must be merge keys (stable routing per key)
    val bad = new SnapshotParquetSink(tmpDir("zbad") + "/t", nBuckets = 16,
      clusterBy = Seq(ClusterCol("val", 0L, 10L)))
    val e2 = intercept[IllegalArgumentException](
      bad.merge(grid, Seq("x", "y"), "seq", "is_delete"))
    assert(e2.getMessage.contains("merge keys"))
    // a clustered table needs power-of-two buckets
    intercept[IllegalArgumentException](
      new SnapshotParquetSink(tmpDir("zb2") + "/t", nBuckets = 12, clusterBy = spec))
  }
}
