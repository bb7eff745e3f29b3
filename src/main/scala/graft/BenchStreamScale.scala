package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.SnapshotParquetSink

/** Bench-only scale ladder for the `graft-snapshot-stream` SOURCE (round
  * 12): the claim is that a catch-up trigger costs O(changed fraction),
  * never O(table) — the offset range's batch reads changed-bucket slices
  * ([[SnapshotParquetSink.readChangedAt]]). Measured per rung (1×/10× rows,
  * constant ~25k-row buckets):
  *
  *   - `initial_sec`: the initial-snapshot batch (this one IS O(table) by
  *     definition — it must deliver the whole state once);
  *   - `catchup_sec`: a one-key upstream update followed by one trigger —
  *     must stay FLAT across table growth (reads one bucket's slice);
  *   - `catchup_rows`: the slice's numInputRows — bounded by bucket size,
  *     not table size.
  *
  * Emits ONE JSON line: {"stream":{...}}.
  */
object BenchStreamScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = args.headOption.map(_.toLong).getOrElse(200000L)
    val mults = if (args.length > 1) args(1).split(',').toSeq.map(_.toLong)
      else Seq(1L, 10L)
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timedSec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val scratch = java.nio.file.Files.createTempDirectory("streamscale").toString

    def table(n: Long, seq: Long) = spark.range(n).select(
      col("id"),
      concat(lit("x"), col("id") * 13L).as("ext"),
      (xxhash64(col("id"), lit(seq)) % 1000000L).as("v"),
      lit(seq).as("seq"),
      lit(false).as("__del"))

    val rungs = mults.map { m =>
      val n = base * m
      val nBuckets = math.max(8, (n / 25000L).toInt)
      val upDir = s"$scratch/up$n"
      val downDir = s"$scratch/down$n"
      val ckpt = s"$scratch/ck$n"
      new SnapshotParquetSink(upDir, nBuckets)
        .merge(table(n, 1L), Seq("id"), "seq", "__del")
      @volatile var lastRows = 0L
      val q = spark.readStream.format("graft-snapshot-stream").load(upDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) {
            val sink =
              if (SnapshotParquetSink.versions(downDir).nonEmpty)
                SnapshotParquetSink.forTable(downDir)
              else new SnapshotParquetSink(downDir, nBuckets)
            sink.merge(b, Seq("id"), "seq", "is_deleted") // Logical-shaped batch
          }
          ()
        }
        .start()
      try {
        val initialSec = timedSec(q.processAllAvailable())
        // one-key update → one catch-up trigger: must stay flat across 10×
        SnapshotParquetSink.forTable(upDir)
          .merge(table(1L, 2L), Seq("id"), "seq", "__del")
        val catchupSec = timedSec(q.processAllAvailable())
        lastRows = q.recentProgress.map(_.numInputRows).filter(_ > 0L).last
        q.stop(); q.awaitTermination()
        // RESTART-CAP leg (round 13, the admission-control claim): the
        // stream is DOWN across 5 one-key commits, then restarts with
        // maxVersionsPerTrigger=1 under AvailableNow — the catch-up must
        // arrive as one bounded slice per version (the V1-only seam
        // caught up as ONE unbounded batch), then self-terminate
        val up = SnapshotParquetSink.forTable(upDir)
        (3L to 7L).foreach(s => up.merge(table(1L, s), Seq("id"), "seq", "__del"))
        val q2 = spark.readStream.format("graft-snapshot-stream")
          .option("maxVersionsPerTrigger", "1").load(upDir)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, _: Long) =>
            if (!b.isEmpty)
              SnapshotParquetSink.forTable(downDir)
                .merge(b, Seq("id"), "seq", "is_deleted")
            ()
          }
          .start()
        val restartSec = timedSec { assert(q2.awaitTermination(300000)) }
        val sizes = q2.recentProgress.map(_.numInputRows).filter(_ > 0L)
        n -> (nBuckets, initialSec, catchupSec, lastRows,
          restartSec, sizes.length, if (sizes.isEmpty) 0L else sizes.max)
      } finally { q.stop(); q.awaitTermination() }
    }
    val body = rungs.map { case (n, (b, init, cu, rows, rs, rb, rmax)) =>
      s""""$n":{"nbuckets":$b,"initial_sec":${num(init)},""" +
        s""""catchup_sec":${num(cu)},"catchup_rows":$rows,""" +
        s""""restart_capped_sec":${num(rs)},"restart_batches":$rb,""" +
        s""""restart_max_batch_rows":$rmax}"""
    }.mkString(",")

    // ---- R30 FAN-OUT leg: ingest cost vs TABLE COUNT over one fixed-size
    // multiplexed input. The per-table-query mode runs N queries that each
    // scan (and JSON-parse) the whole input; shared-scan runs ONE query
    // that caches each micro-batch once and routes N merges. With total
    // input held constant, fanout wall grows ~linearly in N while shared
    // stays ~flat — the N× topic-read cost the shared mode exists to kill.
    def fanoutLeg(nTables: Int, totalRows: Int): (Double, Double) = {
      import graft.streaming.{CdcOrchestrator, FileJsonlSource}
      val root = s"$scratch/fan_$nTables"
      val inDir = new java.io.File(root, "in"); inDir.mkdirs()
      val rowsPerTable = totalRows / nTables
      val w = new java.io.PrintWriter(new java.io.File(inDir, "events.jsonl"), "UTF-8")
      try {
        var seq = 0L; var t = 0
        while (t < nTables) {
          var r = 0
          while (r < rowsPerTable) {
            w.println(s"""{"seq":$seq,"ts":"2024-01-01T00:00:00Z","data":{"database_name":"db","table_name":"t${t}_part_0","primary_key":"$r","metadata":{"is_delete":false},"row":{"id":"$r","v":"${r * 7}"}}}""")
            seq += 1; r += 1
          }
          t += 1
        }
      } finally w.close()
      val csv = new java.io.File(root, "columns.csv")
      val cw = new java.io.PrintWriter(csv, "UTF-8")
      try (0 until nTables).foreach { t =>
        cw.println(s"db.t$t,id,int8,true")
        cw.println(s"db.t$t,v,varchar,false")
      } finally cw.close()
      val fanoutSec = timedSec {
        val running = CdcOrchestrator.addNewTables(
          spark, inDir.toString, csv.toString,
          s"$root/fan_sink", s"$root/fan_ckpt", include = Nil, exclude = Nil)
        running.values.foreach(_.query.processAllAvailable())
        CdcOrchestrator.stopAll(running)
      }
      val sharedSec = timedSec {
        val shared = CdcOrchestrator.addNewTablesSharedScan(
          spark, () => FileJsonlSource(inDir.toString), csv.toString,
          s"$root/sh_sink", s"$root/sh_ckpt", include = Nil, exclude = Nil)
        shared.query.processAllAvailable()
        shared.query.stop(); shared.query.awaitTermination()
      }
      (fanoutSec, sharedSec)
    }
    val fanTotal = 120000
    val fanBody = Seq(2, 8).map { nT =>
      val (f, s) = fanoutLeg(nT, fanTotal)
      s""""$nT":{"tables":$nT,"total_rows":$fanTotal,""" +
        s""""fanout_sec":${num(f)},"shared_scan_sec":${num(s)}}"""
    }.mkString(",")

    // ---- FOLLOWER-BREAKDOWN leg (q61y's lifecycle shape, instrumented):
    // where a stream-driven matview's wall goes — streaming-query
    // bootstrap, per-commit trigger+refresh, stop — against a TWIN that
    // runs the SAME source commits and refreshes via direct refreshTo
    // calls (no stream). commit_trigger − direct_refresh isolates the
    // commit-cursor overhead (offset admission + trigger dispatch, Spark-
    // owned) from the refresh protocol the view pays either way.
    def followerLeg(): String = {
      import graft.sink.{MaterializedAgg, SnapshotParquetSink => Sink}
      def mkPair(tag: String): (Sink, MaterializedAgg) = {
        val src = new Sink(s"$scratch/fol_${tag}_src", 8)
        val agg = new Sink(s"$scratch/fol_${tag}_agg", 8)
        src.merge(table(50000L, 1L), Seq("id"), "seq", "__del")
        (src, new MaterializedAgg(src, agg, Seq("ext"),
          Seq(count(lit(1)).as("n"), sum(col("v")).as("sv"))))
      }
      def oneKey(seq: Long) = table(1L, seq)
      // streamed follower
      val (src1, m1) = mkPair("stream")
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      val startSec = timedSec {
        q = graft.streaming.MatViewStream.follow(
          spark, m1, s"$scratch/fol_ckpt", maxVersionsPerTrigger = 1)
      }
      val initialSec = timedSec(q.processAllAvailable())
      val commitSecs = (2L to 3L).map { s =>
        src1.merge(oneKey(s), Seq("id"), "seq", "__del")
        timedSec(q.processAllAvailable())
      }
      val stopSec = timedSec { q.stop(); q.awaitTermination() }
      // direct twin: same commits, refreshes without the stream
      val (src2, m2) = mkPair("direct")
      val directInitial = timedSec { m2.refresh(spark); () }
      val directSecs = (2L to 3L).map { s =>
        src2.merge(oneKey(s), Seq("id"), "seq", "__del")
        timedSec { m2.refresh(spark); () }
      }
      s""""follower":{"rows":50000,"start_sec":${num(startSec)},""" +
        s""""initial_trigger_sec":${num(initialSec)},""" +
        s""""commit_trigger_secs":[${commitSecs.map(num).mkString(",")}],""" +
        s""""stop_sec":${num(stopSec)},""" +
        s""""direct_initial_sec":${num(directInitial)},""" +
        s""""direct_refresh_secs":[${directSecs.map(num).mkString(",")}]}"""
    }

    println(s"""{"stream":{$body},"fanout":{$fanBody},${followerLeg()}}""")
    graft.engine.Fs.deleteTree(new java.io.File(scratch))
    spark.stop()
  }
}
