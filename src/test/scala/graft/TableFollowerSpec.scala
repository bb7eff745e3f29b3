package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.{DeleteMode, SnapshotParquetSink}
import graft.streaming.TableFollower

/** Table-to-table incremental pipelines ([[graft.streaming.TableFollower]]):
  * the downstream table must equal transform(upstream state) after every
  * catch-up — across updates, deletes, crash-replay (merge landed, marker
  * did not), upstream vacuum past the diff base, and schema evolution —
  * while reading only changed buckets on the incremental path.
  */
class TableFollowerSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Seq[Long], seq: Long, tag: String,
      del: Set[Long] = Set.empty): DataFrame =
    ids.map(i => (i, seq, i * 10, s"$tag$i", del.contains(i)))
      .toDF("id", "seq", "amount", "note", "is_delete")

  private def enrich(df: DataFrame): DataFrame =
    df.withColumn("cents", col("amount") * 100)

  private def expectState(dir: String): Seq[(Long, Long, String)] =
    SnapshotParquetSink.forTable(dir).read(spark, DeleteMode.Hard)
      .select(col("id"), col("cents"), col("note"))
      .as[(Long, Long, String)].collect().sorted.toSeq

  private def directEnrich(up: String): Seq[(Long, Long, String)] =
    enrich(SnapshotParquetSink.forTable(up).read(spark, DeleteMode.Hard))
      .select(col("id"), col("cents"), col("note"))
      .as[(Long, Long, String)].collect().sorted.toSeq

  test("downstream converges to transform(upstream) across waves; diffs stay bucket-pruned") {
    val up = tmpDir("tfup") + "/t"
    val down = tmpDir("tfdn") + "/t"
    val upSink = new SnapshotParquetSink(up, nBuckets = 8)
    val downSink = new SnapshotParquetSink(down, nBuckets = 8)
    val f = new TableFollower(up, downSink, "silver")

    upSink.merge(rows(0L until 64L, 0L, "a"), Seq("id"), "seq", "is_delete")
    assert(f.catchUp(spark, Seq("id"))(enrich).contains(0L))
    assert(expectState(down) == directEnrich(up))
    assert(f.catchUp(spark, Seq("id"))(enrich).isEmpty, "already current")

    // wave 2: a few updates + a delete — the downstream merge must only
    // rewrite the touched buckets (the incremental claim)
    upSink.merge(rows(Seq(3L, 5L), 1L, "b", del = Set(5L)), Seq("id"), "seq", "is_delete")
    assert(f.catchUp(spark, Seq("id"))(enrich).contains(1L))
    assert(expectState(down) == directEnrich(up))
    assert(expectState(down).exists(_._3 == "b3"))
    assert(!expectState(down).exists(_._1 == 5L), "delete must forward")
    val hist = downSink.history(spark)
      .select("version", "rewritten").as[(Long, Int)].collect().toMap
    assert(hist(1L) <= 2, s"incremental catch-up rewrote ${hist(1L)} buckets")
  }

  test("crash between merge and marker: replay is idempotent") {
    val up = tmpDir("tfcup") + "/t"
    val down = tmpDir("tfcdn") + "/t"
    val upSink = new SnapshotParquetSink(up, nBuckets = 4)
    val downSink = new SnapshotParquetSink(down, nBuckets = 4)
    val f = new TableFollower(up, downSink, "s")
    upSink.merge(rows(0L until 16L, 0L, "a"), Seq("id"), "seq", "is_delete")
    f.catchUp(spark, Seq("id"))(enrich)
    upSink.merge(rows(Seq(2L), 1L, "b"), Seq("id"), "seq", "is_delete")
    f.catchUp(spark, Seq("id"))(enrich)
    // simulate the crash window: the marker vanishes AFTER the merge landed
    val markers = new java.io.File(s"$down/_follower/s").listFiles()
      .filter(_.getName.endsWith(".applied")).sortBy(_.getName)
    assert(markers.last.delete())
    val before = expectState(down)
    assert(f.catchUp(spark, Seq("id"))(enrich).contains(1L), "must re-apply")
    assert(expectState(down) == before, "replay must be bit-identical")
    assert(expectState(down) == directEnrich(up))
  }

  test("upstream vacuum past the diff base: self-heal via full resync") {
    val up = tmpDir("tfvup") + "/t"
    val down = tmpDir("tfvdn") + "/t"
    val upSink = new SnapshotParquetSink(up, nBuckets = 4)
    val downSink = new SnapshotParquetSink(down, nBuckets = 4)
    val f = new TableFollower(up, downSink, "s")
    upSink.merge(rows(0L until 16L, 0L, "a"), Seq("id"), "seq", "is_delete")
    f.catchUp(spark, Seq("id"))(enrich)
    upSink.merge(rows(Seq(1L), 1L, "b", del = Set(1L)), Seq("id"), "seq", "is_delete")
    upSink.merge(rows(Seq(2L), 2L, "c"), Seq("id"), "seq", "is_delete")
    upSink.vacuum(keepLast = 1, minOrphanAgeMs = 0L) // drops v0 (the applied base)
    assert(f.catchUp(spark, Seq("id"))(enrich).contains(2L))
    assert(expectState(down) == directEnrich(up))
    assert(!expectState(down).exists(_._1 == 1L), "tombstone forwards through the resync")
    // back on the incremental path afterwards
    upSink.merge(rows(Seq(3L), 3L, "d"), Seq("id"), "seq", "is_delete")
    assert(f.catchUp(spark, Seq("id"))(enrich).contains(3L))
    assert(expectState(down) == directEnrich(up))
  }

  test("schema evolution upstream: the catch-up falls back to the full state") {
    val up = tmpDir("tfeup") + "/t"
    val down = tmpDir("tfedn") + "/t"
    val upSink = new SnapshotParquetSink(up, nBuckets = 4)
    val downSink = new SnapshotParquetSink(down, nBuckets = 4)
    val f = new TableFollower(up, downSink, "s")
    upSink.merge(rows(0L until 16L, 0L, "a"), Seq("id"), "seq", "is_delete")
    f.catchUp(spark, Seq("id"))(enrich)
    // wave 2 adds a column the transform then projects
    upSink.merge(
      Seq((99L, 1L, 990L, "n99", false, "EXTRA"))
        .toDF("id", "seq", "amount", "note", "is_delete", "extra"),
      Seq("id"), "seq", "is_delete")
    val applied = f.catchUp(spark, Seq("id")) { df =>
      enrich(df).withColumn("extra_u", upper(coalesce(col("extra"), lit("-"))))
    }
    assert(applied.contains(1L))
    val out = SnapshotParquetSink.forTable(down).read(spark, DeleteMode.Hard)
    assert(out.filter(col("id") === 99L).select("extra_u").head.getString(0) == "EXTRA")
    assert(out.count() == 17L)
  }

  test("fan-out: N hops share one slice; a late-added hop full-loads while others stay incremental") {
    import graft.streaming.TableFollower.{fanOut, Hop}
    val up = tmpDir("tffup") + "/t"
    val d1 = tmpDir("tffd1") + "/t"
    val d2 = tmpDir("tffd2") + "/t"
    val d3 = tmpDir("tffd3") + "/t"
    val upSink = new SnapshotParquetSink(up, nBuckets = 8)
    val cents = Hop(new SnapshotParquetSink(d1, 8), "cents", Seq("id"), enrich)
    val upperH = Hop(new SnapshotParquetSink(d2, 8), "upper", Seq("id"),
      df => df.withColumn("cents", col("amount") * 100)
        .withColumn("note_u", upper(col("note"))))

    upSink.merge(rows(0L until 64L, 0L, "a"), Seq("id"), "seq", "is_delete")
    val r1 = fanOut(spark, up, Seq(cents, upperH))
    assert(r1 == Map("cents" -> Some(0L), "upper" -> Some(0L)), r1.toString)
    assert(expectState(d1) == directEnrich(up))
    assert(SnapshotParquetSink.forTable(d2).read(spark, DeleteMode.Hard)
      .filter(col("id") === 3L).select("note_u").head.getString(0) == "A3")

    // wave 2: an update + a delete; both hops advance off ONE shared slice
    upSink.merge(rows(Seq(3L, 5L), 1L, "b", del = Set(5L)), Seq("id"), "seq", "is_delete")
    val r2 = fanOut(spark, up, Seq(cents, upperH))
    assert(r2 == Map("cents" -> Some(1L), "upper" -> Some(1L)))
    assert(expectState(d1) == directEnrich(up))
    assert(!SnapshotParquetSink.forTable(d2).read(spark, DeleteMode.Hard)
      .filter(col("id") === 5L).collect().nonEmpty, "delete forwards through both hops")

    // a hop added LATE (applied=None) groups separately: it full-loads
    // while the standing hops report already-current
    val late = Hop(new SnapshotParquetSink(d3, 8), "late", Seq("id"), enrich)
    val r3 = fanOut(spark, up, Seq(cents, upperH, late))
    assert(r3 == Map("cents" -> None, "upper" -> None, "late" -> Some(1L)), r3.toString)
    assert(expectState(d3) == directEnrich(up))

    // idempotent re-run: everyone current
    assert(fanOut(spark, up, Seq(cents, upperH, late)).values.forall(_.isEmpty))
    // distinct-name and empty guards
    intercept[IllegalArgumentException](fanOut(spark, up, Seq(cents, cents)))
    intercept[IllegalArgumentException](fanOut(spark, up, Nil))
  }

  test("multi-hop chain: bronze→silver→gold forwards updates and deletes through both hops") {
    // regression: the silver table is WRITTEN by a follower merge whose
    // delete flag is literally named 'is_deleted' — if the sink persisted
    // that literal column, the gold follower's Logical read of silver would
    // carry TWO 'is_deleted' columns and its merge would die on an
    // ambiguous reference; the chain below must instead run indefinitely
    val bronze = tmpDir("tfc2b") + "/t"
    val silver = tmpDir("tfc2s") + "/t"
    val gold = tmpDir("tfc2g") + "/t"
    val bronzeSink = new SnapshotParquetSink(bronze, nBuckets = 4)
    val silverSink = new SnapshotParquetSink(silver, nBuckets = 4)
    val goldSink = new SnapshotParquetSink(gold, nBuckets = 4)
    val hop1 = new TableFollower(bronze, silverSink, "silver")
    val hop2 = new TableFollower(silver, goldSink, "gold")
    def runChain(): Unit = {
      hop1.catchUp(spark, Seq("id"))(enrich)
      hop2.catchUp(spark, Seq("id"))(
        _.withColumn("note_u", upper(col("note"))))
    }

    bronzeSink.merge(rows(0L until 16L, 0L, "a"), Seq("id"), "seq", "is_delete")
    runChain()
    // exactly ONE is_deleted column on the Logical read of the silver table
    val silverCols = SnapshotParquetSink.forTable(silver)
      .read(spark, DeleteMode.Logical).columns.toSeq
    assert(silverCols.count(_ == "is_deleted") == 1, silverCols.mkString(","))
    assert(SnapshotParquetSink.forTable(gold).read(spark, DeleteMode.Hard)
      .filter(col("id") === 3L).select("note_u").head.getString(0) == "A3")

    // wave 2: update + delete must forward through BOTH hops incrementally
    bronzeSink.merge(rows(Seq(3L, 5L), 1L, "b", del = Set(5L)),
      Seq("id"), "seq", "is_delete")
    runChain()
    val goldState = SnapshotParquetSink.forTable(gold).read(spark, DeleteMode.Hard)
    assert(goldState.filter(col("id") === 3L).select("note_u").head.getString(0) == "B3")
    assert(goldState.filter(col("id") === 5L).collect().isEmpty,
      "delete must forward through two hops")
    assert(goldState.count() == 15L)
    // and gold equals transform2(transform1(bronze)) column-for-column
    val direct = enrich(SnapshotParquetSink.forTable(bronze).read(spark, DeleteMode.Hard))
      .withColumn("note_u", upper(col("note")))
      .select(col("id"), col("cents"), col("note_u"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(goldState.select(col("id"), col("cents"), col("note_u"))
      .as[(Long, Long, String)].collect().sorted.toSeq == direct)
  }

  test("transform contract violations fail loudly") {
    val up = tmpDir("tfxup") + "/t"
    val down = tmpDir("tfxdn") + "/t"
    val upSink = new SnapshotParquetSink(up, nBuckets = 4)
    val f = new TableFollower(up, new SnapshotParquetSink(down, nBuckets = 4), "s")
    upSink.merge(rows(0L until 4L, 0L, "a"), Seq("id"), "seq", "is_delete")
    intercept[IllegalArgumentException](
      f.catchUp(spark, Seq("id"))(_.drop("is_deleted")))
    intercept[IllegalArgumentException](
      f.catchUp(spark, Seq("id"))(_.drop("id")))
    intercept[IllegalArgumentException](new TableFollower(up,
      new SnapshotParquetSink(down, nBuckets = 4), "bad name"))
  }
}
