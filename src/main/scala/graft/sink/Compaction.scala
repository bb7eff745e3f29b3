package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.engine.Dfs

/** Small-file compaction for directory-partitioned tables — the other half
  * of partition lifecycle next to [[Retention]]: retention drops old
  * partitions, compaction fixes the file-count pathology inside the live
  * ones. Streaming and incremental ingest land a file per micro-batch per
  * partition; at 100 TB that is millions of KB-sized parquet files, and scan
  * cost becomes task-scheduling and footer-reading overhead instead of IO.
  * Rewriting each partition to ceil(bytes / targetBytes) files restores the
  * large-sequential-read layout a columnar scan wants.
  *
  * Scale shape: planning is O(partitions) ContentSummary calls (never a
  * data-file walk); each rewrite is a Spark job that reads ONLY that
  * partition's directory. Partitions already at their target file count are
  * skipped and reported — touching a compacted table twice is a no-op.
  *
  * Same report-first contract as [[Retention]]: `dryRun = true` is the
  * default, touches nothing, and returns exactly what would be rewritten
  * (partition values, file counts, bytes) — crash residue is planned
  * through a read-only scratch overlay, so the preview equals the plan a
  * real run (which first repairs) would execute. A real run verifies the
  * rewritten row count AND an order-insensitive content fingerprint against
  * the source BEFORE swapping directories, and the swap is two renames
  * (partition aside, rewrite in) so a crash never leaves a partition
  * half-rewritten — at worst the original sits under a dot-prefixed name
  * that the next run clears. The swap is directory-level, not
  * snapshot-isolated: a reader listing files exactly between the two
  * renames misses the partition. Pipelines needing concurrent-reader
  * isolation use [[SnapshotParquetSink]] (whose `compact` rewrites under a
  * manifest commit); this operator is for the plain `partitionBy("dt")`
  * layout where maintenance windows are the norm.
  */
object Compaction {

  /** One partition due for rewrite: its footprint and target file count. */
  final case class PartitionPlan(value: String, filesBefore: Long, bytes: Long,
      targetFiles: Int)

  /** What a compaction pass rewrote (or would — `executed=false`) and what
    * it left alone. `filesAfter` counts data files (the `_SUCCESS` marker a
    * rewrite job leaves is not data): MEASURED by re-listing the swapped-in
    * partitions on an executed run, the planned target on a dry run.
    */
  final case class CompactionReport(column: String, compacted: Seq[PartitionPlan],
      skipped: Seq[String], executed: Boolean,
      measuredFilesAfter: Option[Long] = None) {
    def filesBefore: Long = compacted.map(_.filesBefore).sum
    def filesAfter: Long =
      measuredFilesAfter.getOrElse(compacted.map(_.targetFiles.toLong).sum)
  }

  /** Partitions whose DATA file count exceeds ceil(bytes / targetBytes),
    * plus the (sorted) values of those already at target. One listStatus
    * call per partition (partition dirs are flat — `partitionBy` writes
    * leaf files directly); markers and hidden files (`_SUCCESS`, dot-files)
    * are not data, so a just-compacted partition plans as clean.
    * `overlay` maps a partition VALUE to an alternate directory to stat in
    * place of (or in absence of) the live one — how a dry run plans a
    * crashed predecessor's partition still sitting in scratch without
    * mutating anything (see [[compactPartitions]]).
    */
  def plan(dir: String, column: String, targetBytes: Long,
      overlay: Map[String, Path] = Map.empty): (Seq[PartitionPlan], Seq[String]) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val live = Retention.partitions(dir, column)
    val all = live ++ overlay.view.filterKeys(v => !live.contains(v)).toMap
    val plans = all.toSeq.sortBy(_._1).map {
      case (v, p) =>
        val data = Dfs.list(p).filter { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        val bytes = data.map(_.getLen).sum
        val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
        PartitionPlan(v, data.size.toLong, bytes, target.toInt)
    }
    val (cand, ok) = plans.partition(pl => pl.filesBefore > pl.targetFiles)
    (cand, ok.map(_.value))
  }

  /** Scratch lives NEXT TO the table, not inside it: a non-partition
    * directory under the table root would break Spark's partition
    * discovery for concurrent readers, and a dot-prefixed one is filtered
    * by the reader the verification step itself needs. Trailing slashes are
    * stripped first — `"t/" + suffix` would land the scratch INSIDE the
    * table as `t/.compact_scratch`.
    */
  private def scratchRoot(dir: String): Path =
    new Path(dir.replaceAll("/+$", "") + ".compact_scratch")

  /** Repairs whatever a crashed prior run left in scratch. The swap order
    * (partition aside as `old_<value>`, rewrite in, delete old) makes every
    * state recoverable: a missing partition with an `old_` present means
    * the crash hit mid-swap and the original is restored; an `old_` next
    * to a live partition is post-swap garbage; `tmp_` is always garbage
    * (the original was never touched before the swap).
    */
  def recover(dir: String, column: String): Unit = {
    Dfs.list(scratchRoot(dir)).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("old_")) {
        val part = new Path(dir, s"$column=${n.stripPrefix("old_")}")
        if (!Dfs.exists(part)) Dfs.rename(s.getPath, part)
        else Dfs.deleteTreeStrict(s.getPath)
      } else Dfs.deleteTreeStrict(s.getPath)
    }
    // the root itself is now empty — leaving it would make a repaired
    // dry run look like an unfinished real run
    if (Dfs.exists(scratchRoot(dir))) Dfs.deleteTreeStrict(scratchRoot(dir))
  }

  /** Read-only view of crash residue: partition values whose live directory
    * is MISSING but whose original sits in scratch as `old_<value>` (the
    * mid-swap crash window). A dry run plans these from their scratch
    * location so preview == the plan a real run (which first [[recover]]s)
    * would execute — without the preview touching the filesystem.
    */
  private def crashOverlay(dir: String, column: String): Map[String, Path] =
    Dfs.list(scratchRoot(dir)).flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith("old_")) {
        val v = n.stripPrefix("old_")
        if (!Dfs.exists(new Path(dir, s"$column=$v"))) Some(v -> s.getPath) else None
      } else None
    }.toMap

  /** (row count, content fingerprint) of a parquet directory in ONE scan:
    * decimal-exact SUM of per-row xxhash64 over all columns (sorted name
    * order, so physical column order is immaterial). Sum, not xor: xor
    * cancels any corruption with even multiplicity ({A,A}→{B,B} passes an
    * xor check); the sum is order-insensitive but multiplicity-sensitive,
    * exact in decimal(38,0) (n·2^63 ≪ 10^38) and ANSI-overflow-free.
    *
    * MAP columns: Spark's hash functions reject MapType (map iteration
    * order is undefined, so a direct hash would be nondeterministic).
    * Schemas containing maps — at any nesting depth — are canonicalized
    * first via [[canonicalizeForHash]]: every map becomes its
    * key-sorted entry array, which hashes deterministically and preserves
    * full content sensitivity (no count-only fallback). Map-free schemas
    * take the plain codegen path untouched.
    */
  private[graft] def contentFingerprint(spark: SparkSession,
      path: Path): (Long, BigDecimal) = {
    val df = spark.read.parquet(path.toString)
    val (c, s) = fingerprintAggs(df)
    val row = df.agg(c, s).head()
    (row.getLong(0), BigDecimal(row.getDecimal(1)))
  }

  /** The fingerprint's two aggregate columns (row count, decimal hash sum)
    * over `df`'s rows — shared by the standalone scan ([[contentFingerprint]])
    * and the `observe`-fused form the rewrite job rides (the source-side
    * fingerprint is computed from the SAME rows the rewrite reads, so
    * fusing it removes one full partition read per compaction, 3 scans per
    * byte → 2).
    */
  private def fingerprintAggs(df: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.{coalesce, count, lit, struct, sum, xxhash64}
    val cols = df.schema.fields.sortBy(_.name)
      .map(f => canonicalizeForHash(df.col(f.name), f.dataType).as(f.name))
    val h = xxhash64(struct(cols.toIndexedSeq: _*)).cast("decimal(38,0)")
    (count(lit(1)).as("c"),
      coalesce(sum(h), lit(java.math.BigDecimal.ZERO)).as("s"))
  }

  /** Rewrites a column into a hash-stable shape: maps (unhashable,
    * iteration-order-undefined) become their entry arrays sorted by key;
    * structs and arrays recurse so maps at ANY depth are reached. The
    * entries are canonicalized BEFORE the sort, so once a nested map has
    * become a sorted array the enclosing struct is orderable and
    * `array_sort`'s struct comparison (field order: key first) is
    * deterministic. Map-free types return the column unchanged — the
    * common case stays inside codegen with zero rewriting.
    */
  private[graft] def canonicalizeForHash(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array_sort, lit, map_entries, struct, transform, when}
    import org.apache.spark.sql.types._
    def containsMap(t: DataType): Boolean = t match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType => containsMap(a.elementType)
      case _ => false
    }
    def canonType(t: DataType): DataType = t match {
      case m: MapType => ArrayType(StructType(Seq(
        StructField("key", canonType(m.keyType), nullable = false),
        StructField("value", canonType(m.valueType), m.valueContainsNull))))
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = canonType(f.dataType))))
      case a: ArrayType => a.copy(elementType = canonType(a.elementType))
      case other => other
    }
    def canon(col: org.apache.spark.sql.Column, t: DataType): org.apache.spark.sql.Column = t match {
      case m: MapType =>
        array_sort(transform(map_entries(col), e =>
          struct(canon(e.getField("key"), m.keyType).as("key"),
            canon(e.getField("value"), m.valueType).as("value"))))
      case s: StructType =>
        // struct() rebuilt from a NULL struct's fields would yield a
        // non-null struct of nulls — a different hash; preserve the null
        when(col.isNull, lit(null).cast(canonType(s))).otherwise(
          struct(s.fields.map(f => canon(col.getField(f.name), f.dataType).as(f.name))
            .toIndexedSeq: _*))
      case a: ArrayType => transform(col, e => canon(e, a.elementType))
      case _ => col
    }
    if (containsMap(dt)) canon(c, dt) else c
  }

  /** Rewrites every partition of `dir` (laid out `column=value/`) that holds
    * more files than its target to exactly ceil(bytes / targetBytes) files.
    * Per candidate: read the partition directory, `repartition(target)`,
    * write to the scratch sibling, verify the rewritten (row count, content
    * fingerprint) — multiplicity-sensitive decimal sum of per-row xxhash64,
    * order-insensitive, same single scan the count already paid — then swap.
    * A mismatch THROWS with the original untouched.
    *
    * Crash residue: a REAL run starts with [[recover]] (restore the
    * partition renamed aside, clear garbage — repair, never a rewrite). A
    * DRY run touches NOTHING: it plans crash residue through a read-only
    * [[crashOverlay]] (statting the scratch copy of a mid-swap partition in
    * place of its missing live directory), so preview == the plan a real
    * run would execute (the q61f invariant) while preview stays safe to
    * issue while a real run on the same table is in flight.
    *
    * Single-maintainer contract for MUTATING runs: at most one real
    * compaction per table at a time — recovery cannot distinguish a crashed
    * predecessor's scratch from a live sibling's. Same directory-level
    * non-isolation already stated above for readers; pipelines needing
    * concurrent maintenance use [[SnapshotParquetSink]]'s
    * manifest-committed compact.
    */
  def compactPartitions(spark: SparkSession, dir: String, column: String,
      targetBytes: Long = 128L << 20, dryRun: Boolean = true,
      perPartitionTimeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(2, java.util.concurrent.TimeUnit.HOURS)): CompactionReport = {
    if (dryRun) {
      val (cand, skip) = plan(dir, column, targetBytes, crashOverlay(dir, column))
      CompactionReport(column, cand, skip, executed = false)
    } else {
      recover(dir, column)
      val (cand, skip) = plan(dir, column, targetBytes)
      def countAndHash(path: Path) = contentFingerprint(spark, path)
      // partitions rewrite CONCURRENTLY (bounded pool): each candidate's
      // read→rewrite→verify→swap touches only its own partition and its own
      // scratch names, so the only shared state is the Spark scheduler —
      // which interleaves the per-partition jobs instead of idling between
      // 3 sequential jobs × N partitions. ALL futures complete before any
      // failure propagates (first failure rethrown only after the await
      // loop) — throwing mid-flight would hand control back to a caller
      // whose retry/recover would race the still-running siblings.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(4, cand.size)))
      val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
      val outcomes =
        try {
          val done = cand.map { pl =>
            scala.concurrent.Future {
              val part = new Path(dir, s"$column=${pl.value}")
              val tmp  = new Path(scratchRoot(dir), s"tmp_${pl.value}")
              val old  = new Path(scratchRoot(dir), s"old_${pl.value}")
              // source fingerprint rides the rewrite's own read (observe):
              // identical rows to the former standalone pre-scan, one full
              // partition read saved. The POST side must stay a separate
              // scan — it verifies what actually landed on disk.
              val src = spark.read.parquet(part.toString)
              val ob = org.apache.spark.sql.Observation(s"cmp_${pl.value}")
              val (cAgg, sAgg) = fingerprintAggs(src)
              src.observe(ob, cAgg, sAgg)
                .repartition(pl.targetFiles).write.mode("overwrite").parquet(tmp.toString)
              val pre = (ob.get("c").asInstanceOf[Long],
                BigDecimal(ob.get("s").asInstanceOf[java.math.BigDecimal]))
              val post = countAndHash(tmp)
              if (post != pre) {
                Dfs.deleteTreeStrict(tmp)
                sys.error(s"compaction of $part rewrote (rows, hash) $post, expected $pre" +
                  " — original left in place")
              }
              Dfs.rename(part, old)
              Dfs.rename(tmp, part)
              Dfs.deleteTreeStrict(old)
            }(ec)
          }
          // finite per-future await: a stuck Spark job must surface as a
          // TimeoutException in the report, not hang the maintainer forever
          // (a timed-out partition's job may still be running — the error
          // message says so, and the next real run's recover() repairs
          // whatever state it left)
          done.map(f => scala.util.Try(
            scala.concurrent.Await.result(f, perPartitionTimeout)))
        } finally pool.shutdown()
      // failure report names EVERY partition's outcome — partitions that
      // already swapped are real state the caller must know about (they are
      // compacted; the originals are gone), not detail to discard
      val byValue = cand.map(_.value).zip(outcomes)
      val failures = byValue.collect { case (v, scala.util.Failure(e)) => (v, e) }
      if (failures.nonEmpty) {
        val swapped = byValue.collect { case (v, scala.util.Success(_)) => v }
        throw new RuntimeException(
          s"compaction of $dir failed for partition(s) " +
            failures.map { case (v, e) => s"$v (${e.getClass.getSimpleName}: ${e.getMessage})" }
              .mkString("[", "; ", "]") +
            s"; partitions already swapped successfully: ${swapped.mkString("[", ", ", "]")}" +
            "; a timed-out partition's Spark job may still be running — wait for it before retrying",
          failures.head._2)
      }
      // every candidate swapped and cleaned — the scratch root is empty
      Dfs.deleteTreeStrict(scratchRoot(dir))
      // measured, not planned: re-list the swapped-in partitions
      val measured = cand.map { pl =>
        Dfs.list(new Path(dir, s"$column=${pl.value}")).count { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.toLong
      }.sum
      CompactionReport(column, cand, skip, executed = true,
        measuredFilesAfter = Some(measured))
    }
  }
}
