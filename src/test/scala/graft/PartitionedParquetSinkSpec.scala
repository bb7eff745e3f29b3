package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import graft.sink.{DeleteMode, LocalParquetSink, PartitionedParquetSink}

/** The bucket-partitioned sink must agree with LocalParquetSink on every
  * merge semantic while touching only the buckets a batch hits.
  */
class PartitionedParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, Long, String, Boolean)*): DataFrame =
    rows.toSeq.toDF("primary_key", "seq", "val", "is_delete")

  private def state(sink: graft.sink.UpsertSink, mode: DeleteMode): Map[String, (Long, String)] =
    sink.read(spark, mode).collect()
      .map(r => r.getAs[String]("primary_key") ->
        (r.getAs[Long]("seq"), r.getAs[String]("val"))).toMap

  test("agrees with LocalParquetSink across an insert/update/delete sequence") {
    val part = new PartitionedParquetSink(tmpDir("psink") + "/t", nBuckets = 4)
    val local = new LocalParquetSink(tmpDir("lsink") + "/t")
    val batches = Seq(
      batch(("a", 0, "a0", false), ("b", 1, "b0", false), ("c", 2, "c0", false)),
      batch(("a", 3, "a1", false), ("b", 4, "del", true)),
      batch(("b", 2, "stale", false)), // stale post-delete event: tombstone wins
      batch(("d", 5, "d0", false)))
    batches.foreach { b =>
      part.merge(b, Seq("primary_key"), "seq", "is_delete")
      local.merge(b, Seq("primary_key"), "seq", "is_delete")
    }
    assert(state(part, DeleteMode.Hard) == state(local, DeleteMode.Hard))
    assert(state(part, DeleteMode.Hard) ==
      Map("a" -> (3L, "a1"), "c" -> (2L, "c0"), "d" -> (5L, "d0")))
    val logical = part.read(spark, DeleteMode.Logical).collect()
      .map(r => r.getAs[String]("primary_key") -> r.getAs[Boolean]("is_deleted")).toMap
    assert(logical("b") && !logical("a"))
  }

  test("merge is idempotent under batch replay") {
    val sink = new PartitionedParquetSink(tmpDir("psink") + "/t", nBuckets = 4)
    val b = batch(("a", 0, "a0", false), ("a", 1, "a1", false))
    sink.merge(b, Seq("primary_key"), "seq", "is_delete")
    val first = state(sink, DeleteMode.Hard)
    sink.merge(b, Seq("primary_key"), "seq", "is_delete")
    assert(state(sink, DeleteMode.Hard) == first && first == Map("a" -> (1L, "a1")))
  }

  test("a merge rewrites only the buckets its batch touches") {
    val dir = tmpDir("psink") + "/t"
    val sink = new PartitionedParquetSink(dir, nBuckets = 8)
    // spread keys over several buckets
    val keys = (0 until 32).map(i => s"k$i")
    sink.merge(batch(keys.map(k => (k, 0L, s"$k-v0", false)): _*),
      Seq("primary_key"), "seq", "is_delete")
    val bucketDirs = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("__bucket=")).sorted
    assert(bucketDirs.length > 1, s"expected multiple buckets, got $bucketDirs")
    val before = bucketDirs.map(d => d -> Files.list(Paths.get(d)).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).sorted.toSeq).toMap
    // a single-key merge must leave every other bucket's files untouched
    sink.merge(batch(("k0", 1L, "k0-v1", false)), Seq("primary_key"), "seq", "is_delete")
    val touched = bucketDirs.filter { d =>
      val now = Files.list(Paths.get(d)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).sorted.toSeq
      now != before(d)
    }
    assert(touched.length == 1, s"expected exactly one rewritten bucket, got $touched")
    assert(state(sink, DeleteMode.Hard)("k0") == ((1L, "k0-v1")))
    assert(state(sink, DeleteMode.Hard).size == 32)
  }

  test("schema evolution: new column null-backfilled, old buckets not rewritten") {
    val sink = new PartitionedParquetSink(tmpDir("psink") + "/t", nBuckets = 4)
    sink.merge(batch(("a", 0, "a0", false)), Seq("primary_key"), "seq", "is_delete")
    val evolved = Seq(("zz", 1L, "z0", false, "extra"))
      .toDF("primary_key", "seq", "val", "is_delete", "new_col")
    sink.merge(evolved, Seq("primary_key"), "seq", "is_delete")
    val rows = sink.read(spark, DeleteMode.Hard).collect()
      .map(r => r.getAs[String]("primary_key") -> Option(r.getAs[String]("new_col"))).toMap
    assert(rows == Map("a" -> None, "zz" -> Some("extra")))
  }

  test("point lookup reads only the key's bucket and agrees with the full read") {
    val dir = tmpDir("psink") + "/t"
    val sink = new PartitionedParquetSink(dir, nBuckets = 8)
    val keys = (0 until 32).map(i => s"k$i")
    sink.merge(batch(keys.map(k => (k, 0L, s"$k-v", false)): _*),
      Seq("primary_key"), "seq", "is_delete")
    for (k <- Seq("k0", "k17", "k31")) {
      val row = sink.lookup(spark, Seq("primary_key"), Seq(k)).collect()
      assert(row.length == 1 && row.head.getAs[String]("val") == s"$k-v", k)
    }
    assert(sink.lookup(spark, Seq("primary_key"), Seq("absent")).isEmpty)
    // a deleted key resolves to nothing under Hard mode
    sink.merge(batch(("k0", 1L, "gone", true)), Seq("primary_key"), "seq", "is_delete")
    assert(sink.lookup(spark, Seq("primary_key"), Seq("k0")).isEmpty)
  }

  test("lookup casts the probe value to the stored key type (no silent bucket miss)") {
    val sink = new PartitionedParquetSink(tmpDir("psink") + "/t", nBuckets = 8)
    // numeric-looking STRING keys: probing with an Int must still find them
    sink.merge(batch(("42", 0L, "v42", false), ("7", 1L, "v7", false)),
      Seq("primary_key"), "seq", "is_delete")
    val viaInt = sink.lookup(spark, Seq("primary_key"), Seq(42)).collect()
    assert(viaInt.length == 1 && viaInt.head.getAs[String]("val") == "v42")
  }

  test("lookup on a never-merged sink returns empty without throwing") {
    val sink = new PartitionedParquetSink(tmpDir("psink") + "/untouched", nBuckets = 8)
    assert(sink.lookup(spark, Seq("primary_key"), Seq("x")).isEmpty)
  }

  test("last-write-wins is invariant under event-order permutation") {
    val events = Seq(("k", 0L, "v0", false), ("k", 1L, "v1", false),
      ("k", 2L, "v2", false), ("j", 3L, "w0", false))
    val expected = Map("k" -> (2L, "v2"), "j" -> (3L, "w0"))
    for (perm <- Seq(events, events.reverse)) {
      val sink = new PartitionedParquetSink(tmpDir("psink") + "/t", nBuckets = 4)
      perm.foreach(e => sink.merge(batch(e), Seq("primary_key"), "seq", "is_delete"))
      assert(state(sink, DeleteMode.Hard) == expected, s"order: $perm")
    }
  }

  test("crashed replaceAll fails reads/merges loudly; re-running the replace repairs") {
    val dir = tmpDir("psink") + "/t"
    val sink = new PartitionedParquetSink(dir, nBuckets = 4)
    val keys = (0 until 16).map(i => s"k$i")
    sink.merge(batch(keys.map(k => (k, 0L, s"$k-v0", false)): _*),
      Seq("primary_key"), "seq", "is_delete")
    val load = batch(("k0", 1L, "k0-v1", false))
    sink.replaceAll(load, Seq("primary_key"), "seq", "is_delete")
    // fabricate the crash window the ADVICE flagged: the static overwrite
    // committed (narrow layout live) but the crash hit before backup
    // cleanup — pre-image backup and in-progress marker still on disk.
    // recover() restoring the wider backup here would silently resurrect
    // superseded rows; it must refuse instead.
    val backup = Paths.get(dir + ".backup")
    Files.createDirectories(backup.resolve("__bucket=0"))
    Files.write(backup.resolve("__bucket=0").resolve("part-stale.parquet"),
      Array[Byte](1, 2, 3))
    Files.write(Paths.get(dir + ".replace-in-progress"), Array[Byte]())
    val e = intercept[RuntimeException](sink.read(spark, DeleteMode.Hard))
    assert(e.getMessage.contains("crashed mid-commit"))
    intercept[RuntimeException](
      sink.merge(load, Seq("primary_key"), "seq", "is_delete"))
    // the documented repair: re-run the replace — the stale backup is
    // discarded (never restored), state is exactly the load
    sink.replaceAll(load, Seq("primary_key"), "seq", "is_delete")
    assert(state(sink, DeleteMode.Hard) == Map("k0" -> ((1L, "k0-v1"))))
    assert(!Files.exists(backup), "stale pre-image backup must be discarded")
    assert(!Files.exists(Paths.get(dir + ".replace-in-progress")))
  }

  test("replaceAll: every bucket superseded, stale buckets deleted, types replaced") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("psink") + "/t"
    val sink = new PartitionedParquetSink(dir, nBuckets = 4)
    val keys = (0 until 16).map(i => s"k$i")
    sink.merge(batch(keys.map(k => (k, 0L, s"$k-v0", false)): _*)
      .withColumn("num", lit(7L)), Seq("primary_key"), "seq", "is_delete")
    // rebuild from TWO keys only, num retyped LONG -> STRING
    sink.replaceAll(batch(("k0", 1L, "k0-v1", false), ("k1", 1L, "k1-v1", false))
      .withColumn("num", lit("7")), Seq("primary_key"), "seq", "is_delete")
    val got = sink.read(spark, DeleteMode.Hard)
    assert(got.select("primary_key").collect().map(_.getString(0)).toSet == Set("k0", "k1"))
    assert(got.schema("num").dataType == org.apache.spark.sql.types.StringType)
  }
}
