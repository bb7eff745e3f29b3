package graft

import org.apache.spark.sql.functions._
import graft.sink.{PinConflict, SnapshotCatalog, SnapshotParquetSink}

/** Bench-only scale ladder for the CATALOG layer (round 12): the claims the
  * same-table conflict seam and epoch GC make must hold as member tables
  * and writers multiply, and both are metadata-only properties a local box
  * can measure faithfully (no data volume involved):
  *
  *   - `commit_sec` vs member count: a cut pinning N tables is one
  *     manifest write + N current-version listings — linear in N with a
  *     small constant, no data reads (the consistent-cut cost at a
  *     100-table warehouse is the number that matters to a deployment);
  *   - `conflict_storm`: K writers racing to pin the SAME table under
  *     PinConflict.Advance — every commit must land, the head must pin the
  *     newest table version (never regress), and total attempts stay
  *     near K (the optimistic lock converges instead of livelocking);
  *   - `epoch_gc`: W writers stamping epochs across R rounds with a
  *     vacuum per round — the HEAD manifest's epoch-line count must stay
  *     bounded by the writers live within the vacuum horizon, not grow
  *     with every writer that ever existed (the pre-GC behavior).
  *
  * Emits ONE JSON line: {"catalog":{...}}.
  */
object BenchCatalogScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val scratch = java.nio.file.Files.createTempDirectory("catscale").toString

    def seedTable(cat: SnapshotCatalog, name: String): Unit =
      cat.table(name, nBuckets = 2).merge(
        Seq((name, 1L, false)).toDF("primary_key", "seq", "is_delete"),
        Seq("primary_key"), "seq", "is_delete")

    // --- commit latency vs member count --------------------------------
    val commitCosts = Seq(10, 100).map { n =>
      val cat = new SnapshotCatalog(s"$scratch/members$n")
      val names = (0 until n).map(i => s"t$i")
      names.foreach(seedTable(cat, _))
      val (_, warm) = timed(cat.commitCurrent(names)) // v0 (includes mkdir)
      // steady state as min-of-5: a single ~50 ms commit is timer/dentry
      // noise-dominated — the min is the protocol's actual cost on an
      // idle box (each repetition publishes a real new catalog version)
      val sec = (0 until 5).map(_ => timed(cat.commitCurrent(names))._2).min
      n -> (warm, sec)
    }

    // --- same-table conflict storm under Advance ------------------------
    val stormWriters = 8
    val stormDir = s"$scratch/storm"
    val stormCat = new SnapshotCatalog(stormDir)
    seedTable(stormCat, "hot")
    // advance the hot table so stale pins exist to race with
    (2 to 4).foreach(i => stormCat.openTable("hot").merge(
      Seq(("hot", i.toLong, false)).toDF("primary_key", "seq", "is_delete"),
      Seq("primary_key"), "seq", "is_delete"))
    val hotHead = SnapshotParquetSink.versions(s"$stormDir/hot").max
    val pool = java.util.concurrent.Executors.newFixedThreadPool(stormWriters)
    val (stormVersions, stormSec) = timed {
      val futs = (0 until stormWriters).map { k =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = new SnapshotCatalog(stormDir)
            .commit(Map("hot" -> (k.toLong % (hotHead + 1))), // mixed stale/fresh pins
              onConflict = PinConflict.Advance)
        })
      }
      futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    }
    pool.shutdown()
    val stormLanded = stormVersions.toSet.size
    val headPin = stormCat.pins(stormCat.currentVersion.get)("hot")

    // --- epoch GC boundedness -------------------------------------------
    // Two regimes since round 13 (epochCarryMinVersions):
    //   horizon (floor 0): a stamp dies with its stamping version's
    //     retention — the head manifest collapses 100 → 1 immediately;
    //   floor (default 64): stamps survive ≥ floor catalog versions
    //     regardless of vacuum — slow writers keep replay protection, and
    //     the head manifest is bounded by (live writers + floor window),
    //     never by total writers ever seen.
    val writers = 100
    val rounds = 3
    val gcDir = s"$scratch/egc"
    val gcCat = new SnapshotCatalog(gcDir, epochCarryMinVersions = 0)
    seedTable(gcCat, "a")
    // every writer stamps once (generation 0) ...
    (0 until writers).foreach(w => gcCat.commitEpoch(Seq("a"), s"w$w", 0L))
    val headEpochsBeforeGc = gcCat.epochStamps(gcCat.currentVersion.get).size
    // ... then only ONE writer stays live across vacuumed rounds
    (1 to rounds).foreach { r =>
      gcCat.vacuum(keepLast = 1, minOrphanAgeMs = 0L)
      gcCat.commitEpoch(Seq("a"), "w0", r.toLong)
    }
    val headEpochsAfterGc = gcCat.epochStamps(gcCat.currentVersion.get).size
    val liveProtected = gcCat.lastEpoch("w0").contains(rounds.toLong)

    // floor regime: a slow writer (one stamp ever) must survive
    // keepLast=1 vacuums while inside the floor window, and the head must
    // stay bounded once the window passes — measured over 2× floor cuts
    val floorN = 16
    val floorDir = s"$scratch/egcf"
    val floorCat = new SnapshotCatalog(floorDir, epochCarryMinVersions = floorN)
    seedTable(floorCat, "a")
    floorCat.commitEpoch(Seq("a"), "slow", 0L)
    val protectedAtHalf = {
      (1 to floorN / 2).foreach { r =>
        floorCat.commitEpoch(Seq("a"), "fast", r.toLong)
        floorCat.vacuum(keepLast = 1, minOrphanAgeMs = 0L)
      }
      floorCat.lastEpoch("slow").contains(0L)
    }
    val gcPastFloor = {
      (1 to floorN * 2).foreach(r =>
        floorCat.commitEpoch(Seq("a"), "fast", (floorN / 2 + r).toLong))
      floorCat.vacuum(keepLast = 1, minOrphanAgeMs = 0L)
      floorCat.commitEpoch(Seq("a"), "fast", 999L)
      floorCat.lastEpoch("slow").isEmpty
    }
    val floorHeadEpochs = floorCat.epochStamps(floorCat.currentVersion.get).size

    val commitJson = commitCosts.map { case (n, (warm, sec)) =>
      s""""$n":{"first_commit_sec":${num(warm)},"steady_commit_sec":${num(sec)}}"""
    }.mkString(",")
    println(
      s"""{"catalog":{"commit_by_members":{$commitJson},""" +
      s""""conflict_storm":{"writers":$stormWriters,"landed":$stormLanded,""" +
      s""""head_pin":$headPin,"hot_head":$hotHead,"wall_sec":${num(stormSec)}},""" +
      s""""epoch_gc":{"writers":$writers,"head_epochs_before_gc":$headEpochsBeforeGc,""" +
      s""""head_epochs_after_gc":$headEpochsAfterGc,"live_writer_protected":$liveProtected},""" +
      s""""epoch_floor":{"floor":$floorN,"slow_protected_inside_floor":$protectedAtHalf,""" +
      s""""slow_gcd_past_floor":$gcPastFloor,"head_epochs":$floorHeadEpochs}}}""")
    graft.engine.Fs.deleteTree(new java.io.File(scratch))
    spark.stop()
  }
}
