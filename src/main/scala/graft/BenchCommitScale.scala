package graft

import org.apache.spark.sql.functions._
import graft.sink.SnapshotParquetSink

/** Bench-only scale ladder for the snapshot COMMIT path (round 11):
  * deterministic synthetic tables at 1×/10× a base row count, constant
  * ~25k-row buckets (the 100 TB layout rule: more data ⇒ more buckets).
  * Claims measured per rung:
  *
  *   - `bloom_overhead`: what the per-commit bloom-sidecar pass
  *     ([[graft.sink.BloomIndex]]) adds to a full-table merge — one
  *     distinct-hash aggregation over the new files, expected a bounded
  *     fraction of the commit, flat-ish across scale;
  *   - `occ`: K=4 writers of bucket-DISJOINT batches committing
  *     CONCURRENTLY vs the same four merges applied sequentially.
  *     `data_writes` == 4 certifies the rebase fast path: every commit-race
  *     loss was resolved by republishing the already-written files
  *     (`rebases` counts them), never by recomputing the merge. Wall-clock
  *     speedup is secondary on a shared local[32] box (the merges compete
  *     for the same cores); the 1000-executor claim rides on data_writes.
  *
  * Synthesis is pure integer arithmetic (no RNG). Emits ONE JSON line:
  * {"commit":{"<rows>":{...}}}
  */
object BenchCommitScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = args.headOption.map(_.toLong).getOrElse(200000L)
    val mults = if (args.length > 1) args(1).split(',').toSeq.map(_.toLong)
      else Seq(1L, 10L)
    val writers = 4
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val scratch = java.nio.file.Files.createTempDirectory("commitscale").toString

    def table(n: Long, seq: Long) = spark.range(n).select(
      col("id"),
      concat(lit("x"), col("id") * 13L).as("ext"),
      (xxhash64(col("id"), lit(seq)) % 1000000L).as("v"),
      lit(seq).as("seq"),
      lit(false).as("__del"))

    // writer k's batch: n/50 updated keys restricted to buckets ≡ k (mod
    // writers) — bucket-disjoint by construction, so concurrent commits
    // must all resolve via rebase
    def slice(n: Long, nBuckets: Int, k: Int) =
      table(n, 2L).filter(pmod(col("id"), lit(50L)) === 0L)
        .filter(pmod(pmod(xxhash64(col("id")), lit(nBuckets)), lit(writers)) === k)

    // warm-up (untimed): codegen + shuffle machinery
    locally {
      val s = new SnapshotParquetSink(s"$scratch/warm", 8, bloomCols = Seq("ext"))
      s.merge(table(5000L, 1L), Seq("id"), "seq", "__del")
    }

    def rung(n: Long): String = {
      val nBuckets = math.max(16, (n / 25000L).toInt)
      // bloom overhead: same full-table merge with and without sidecars —
      // min-of-5, GENUINELY interleaved plain/bloom pairs (running one
      // variant's block before the other's hands the second block a warmer
      // JIT/page cache and was measured to swing the overhead ratio
      // 0.3↔1.0 between invocations of the same binary)
      val runs = 5
      // three interleaved variants: plain, bloom (the DEFAULT path —
      // fused sidecar build; parquet-native filters are evidence-gated
      // off for a healthy layout), and bloom with the native layer
      // FORCED (what a table with saturated buckets pays)
      val triples = (0 until runs).map { r =>
        val p = timed(new SnapshotParquetSink(s"$scratch/plain_${n}_$r", nBuckets)
          .merge(table(n, 1L), Seq("id"), "seq", "__del"))._2
        val b = timed(new SnapshotParquetSink(s"$scratch/bloom_${n}_$r", nBuckets,
          bloomCols = Seq("ext"))
          .merge(table(n, 1L), Seq("id"), "seq", "__del"))._2
        sys.props("graft.bloom.forceNative") = "1"
        val bn = try timed(new SnapshotParquetSink(
          s"$scratch/bloomnat_${n}_$r", nBuckets, bloomCols = Seq("ext"))
          .merge(table(n, 1L), Seq("id"), "seq", "__del"))._2
        finally { sys.props.remove("graft.bloom.forceNative"); () }
        (p, b, bn)
      }
      val plainSec = triples.map(_._1).min
      val bloomSec = triples.map(_._2).min
      val bloomNativeSec = triples.map(_._3).min

      // point-lookup latency through the DSv2 scan: on the bloom-indexed
      // table the planned file set is ~constant (target bucket + rare FPs),
      // so probe wall time should stay FLAT across table scale, while the
      // unindexed table's probe must open every bucket file
      val probeTarget = s"x${(n / 2L) * 13L}"
      def probe(dirP: String): (Double, Int) = {
        val secs = (0 until runs).map { _ =>
          val df = spark.read.format("graft-snapshot").load(dirP)
            .filter(col("ext") === probeTarget)
          timed(df.count())._2
        }.min
        val df = spark.read.format("graft-snapshot").load(dirP)
          .filter(col("ext") === probeTarget)
        df.count()
        val files = df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.scan match {
              case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
                f.fileIndex.inputFiles.length
            }
        }.sum
        (secs, files)
      }
      val (probeBloomSec, probeBloomFiles) = probe(s"$scratch/bloom_${n}_0")
      val (probePlainSec, probePlainFiles) = probe(s"$scratch/plain_${n}_0")

      // sequential baseline: base commit + 4 disjoint merges, one handle
      val seqDir = s"$scratch/seq_$n"
      new SnapshotParquetSink(seqDir, nBuckets).merge(table(n, 1L), Seq("id"), "seq", "__del")
      val seqSink = SnapshotParquetSink.forTable(seqDir)
      val (_, seqSec) = timed(
        (0 until writers).foreach(k =>
          seqSink.merge(slice(n, nBuckets, k), Seq("id"), "seq", "__del")))

      // concurrent: same four batches, four handles, four threads
      val concDir = s"$scratch/conc_$n"
      new SnapshotParquetSink(concDir, nBuckets).merge(table(n, 1L), Seq("id"), "seq", "__del")
      val sinks = (0 until writers).map(_ => SnapshotParquetSink.forTable(concDir))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val (_, concSec) = timed {
        val ts = (0 until writers).map { k =>
          new Thread(() =>
            try sinks(k).merge(slice(n, nBuckets, k), Seq("id"), "seq", "__del")
            catch { case t: Throwable => errs.add(t); () }, s"occ-$k")
        }
        ts.foreach(_.start())
        ts.foreach(_.join())
      }
      if (!errs.isEmpty) throw errs.peek()
      val infos = sinks.flatMap(_.lastCommit)
      val rebases = infos.map(_.rebases).sum
      val dataWrites = infos.map(_.dataWrites).sum
      // convergence check: concurrent result ≡ sequential result
      val seqCnt = seqSink.read(spark, graft.sink.DeleteMode.Hard).count()
      val concCnt = SnapshotParquetSink.forTable(concDir)
        .read(spark, graft.sink.DeleteMode.Hard).count()
      require(seqCnt == concCnt, s"concurrent writers diverged: $concCnt != $seqCnt")
      s""""$n":{"rows":$n,"nbuckets":$nBuckets,
         |"merge_sec":${num(plainSec)},"merge_bloom_sec":${num(bloomSec)},
         |"bloom_overhead":${num(bloomSec / math.max(plainSec, 1e-9) - 1.0)},
         |"merge_bloom_native_sec":${num(bloomNativeSec)},
         |"bloom_native_overhead":${num(bloomNativeSec / math.max(plainSec, 1e-9) - 1.0)},
         |"probe_bloom_sec":${num(probeBloomSec)},"probe_bloom_files":$probeBloomFiles,
         |"probe_plain_sec":${num(probePlainSec)},"probe_plain_files":$probePlainFiles,
         |"seq_4_merges_sec":${num(seqSec)},"conc_4_writers_sec":${num(concSec)},
         |"conc_speedup":${num(seqSec / math.max(concSec, 1e-9))},
         |"rebases":$rebases,"data_writes":$dataWrites}"""
        .stripMargin.replaceAll("\n", "")
    }
    val rungs = mults.map(m => rung(base * m))
    println(s"""{"commit":{${rungs.mkString(",")}}}""")
    graft.engine.Fs.deleteTree(new java.io.File(scratch))
    spark.stop()
  }
}
