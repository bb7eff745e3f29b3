package graft

import org.apache.spark.sql.DataFrame
import graft.sink.{DeleteMode, LocalParquetSink}

class LocalParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, Long, String, Boolean)*): DataFrame =
    rows.toSeq.toDF("primary_key", "seq", "val", "is_delete")

  private def state(sink: LocalParquetSink, mode: DeleteMode): Map[String, (Long, String)] =
    sink.read(spark, mode).collect()
      .map(r => r.getAs[String]("primary_key") ->
        (r.getAs[Long]("seq"), r.getAs[String]("val"))).toMap

  test("insert/update/delete matrix with last-write-wins") {
    val sink = new LocalParquetSink(tmpDir("sink") + "/t")
    sink.merge(batch(("a", 0, "a0", false), ("b", 1, "b0", false)), Seq("primary_key"), "seq", "is_delete")
    sink.merge(batch(("a", 2, "a1", false), ("b", 3, "b1", true)), Seq("primary_key"), "seq", "is_delete")
    val hard = state(sink, DeleteMode.Hard)
    assert(hard == Map("a" -> (2L, "a1")))
    val logical = sink.read(spark, DeleteMode.Logical).collect()
      .map(r => r.getAs[String]("primary_key") -> r.getAs[Boolean]("is_deleted")).toMap
    assert(logical == Map("a" -> false, "b" -> true))
  }

  test("merge is idempotent under batch replay") {
    val sink = new LocalParquetSink(tmpDir("sink") + "/t")
    val b = batch(("a", 0, "a0", false), ("a", 1, "a1", false))
    sink.merge(b, Seq("primary_key"), "seq", "is_delete")
    val first = state(sink, DeleteMode.Hard)
    sink.merge(b, Seq("primary_key"), "seq", "is_delete")
    assert(state(sink, DeleteMode.Hard) == first && first == Map("a" -> (1L, "a1")))
  }

  test("stale out-of-order event cannot resurrect a deleted key (tombstone wins by seq)") {
    val sink = new LocalParquetSink(tmpDir("sink") + "/t")
    sink.merge(batch(("a", 5, "del", true)), Seq("primary_key"), "seq", "is_delete")
    sink.merge(batch(("a", 2, "stale", false)), Seq("primary_key"), "seq", "is_delete")
    assert(state(sink, DeleteMode.Hard).isEmpty)
    // but a NEWER insert does resurrect
    sink.merge(batch(("a", 7, "new", false)), Seq("primary_key"), "seq", "is_delete")
    assert(state(sink, DeleteMode.Hard) == Map("a" -> (7L, "new")))
  }

  test("last-write-wins is invariant under event-order permutation") {
    val events = Seq(("k", 0L, "v0", false), ("k", 1L, "v1", false),
      ("k", 2L, "v2", false), ("j", 3L, "w0", false))
    val expected = Map("k" -> (2L, "v2"), "j" -> (3L, "w0"))
    for (perm <- Seq(events, events.reverse, scala.util.Random.shuffle(events))) {
      val sink = new LocalParquetSink(tmpDir("sink") + "/t")
      perm.foreach(e => sink.merge(batch(e), Seq("primary_key"), "seq", "is_delete"))
      assert(state(sink, DeleteMode.Hard) == expected, s"order: $perm")
    }
  }

  test("recovers a crash between the two swap moves (table only under .old)") {
    val dir = tmpDir("sink") + "/t"
    val sink = new LocalParquetSink(dir)
    sink.merge(batch(("a", 0, "a0", false)), Seq("primary_key"), "seq", "is_delete")
    // simulate a crash after dir -> .old but before tmp -> dir
    java.nio.file.Files.move(java.nio.file.Paths.get(dir), java.nio.file.Paths.get(dir + ".old"))
    sink.merge(batch(("b", 1, "b0", false)), Seq("primary_key"), "seq", "is_delete")
    // without recovery the prior state would be silently lost
    assert(state(sink, DeleteMode.Hard) == Map("a" -> (0L, "a0"), "b" -> (1L, "b0")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".old")))
  }

  test("drops a stale .old left by a crash after the swap completed") {
    val dir = tmpDir("sink") + "/t"
    val sink = new LocalParquetSink(dir)
    sink.merge(batch(("a", 0, "a0", false)), Seq("primary_key"), "seq", "is_delete")
    // simulate a crash after both moves but before the .old cleanup
    val old = java.nio.file.Paths.get(dir + ".old")
    java.nio.file.Files.createDirectory(old)
    java.nio.file.Files.write(old.resolve("stale.parquet"), Array[Byte](1, 2, 3))
    sink.merge(batch(("b", 1, "b0", false)), Seq("primary_key"), "seq", "is_delete")
    assert(state(sink, DeleteMode.Hard) == Map("a" -> (0L, "a0"), "b" -> (1L, "b0")))
    assert(!java.nio.file.Files.exists(old))
  }

  test("schema evolution: new column null-backfilled for old rows") {
    val sink = new LocalParquetSink(tmpDir("sink") + "/t")
    sink.merge(batch(("a", 0, "a0", false)), Seq("primary_key"), "seq", "is_delete")
    val evolved = Seq(("b", 1L, "b0", false, "extra")).toDF("primary_key", "seq", "val", "is_delete", "new_col")
    sink.merge(evolved, Seq("primary_key"), "seq", "is_delete")
    val rows = sink.read(spark, DeleteMode.Hard).collect()
      .map(r => r.getAs[String]("primary_key") -> Option(r.getAs[String]("new_col"))).toMap
    assert(rows == Map("a" -> None, "b" -> Some("extra")))
  }

  test("replaceAll: prior state, stale keys, and stored TYPES are superseded") {
    import org.apache.spark.sql.functions._
    val sink = new LocalParquetSink(tmpDir("sink") + "/t")
    sink.merge(batch(("a", 0, "a0", false), ("b", 1, "b0", false)),
      Seq("primary_key"), "seq", "is_delete")
    // store a LONG `num` column, then rebuild with key b gone and `num`
    // retyped to STRING -- the replace must not union with the stored LONG
    val narrow = batch(("a", 0, "a0", false)).withColumn("num", lit(7L))
    sink.merge(narrow, Seq("primary_key"), "seq", "is_delete")
    val wide = batch(("a", 2, "a2", false), ("c", 3, "c0", false))
      .withColumn("num", lit("7"))
    sink.replaceAll(wide, Seq("primary_key"), "seq", "is_delete")
    val got = sink.read(spark, DeleteMode.Hard)
    // stale key b gone, new key c present, types from the batch alone
    assert(state(sink, DeleteMode.Hard).keySet == Set("a", "c"))
    assert(got.schema("num").dataType == org.apache.spark.sql.types.StringType)
    // a replayed merge after the replace still orders deterministically
    sink.merge(batch(("a", 2, "aX", false)).withColumn("num", lit("9")),
      Seq("primary_key"), "seq", "is_delete")
    assert(state(sink, DeleteMode.Hard)("a")._2 == "aX") // same seq, newer gen wins
  }
}
