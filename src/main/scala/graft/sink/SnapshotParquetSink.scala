package graft.sink

import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Dfs

/** Snapshot-isolated MERGE sink over immutable parquet files — the
  * table-format layer (the pattern Delta Lake / Apache Iceberg use): data
  * files are written once and never modified; a commit is the ATOMIC
  * publication of a new manifest that lists, per hash bucket, the file
  * holding that bucket's current state. Readers resolve the highest
  * published manifest, so they always see a complete committed snapshot:
  *
  *   - NO crash window: a crash anywhere before the manifest publish leaves
  *     orphan data files and an intact table at the previous version — no
  *     backup/restore protocol needed (contrast [[LocalParquetSink]]'s
  *     two-move swap and [[PartitionedParquetSink]]'s bucket backups);
  *   - incremental merges: unaffected buckets carry their manifest entries
  *     forward untouched — merge cost is O(affected fraction), same as
  *     [[PartitionedParquetSink]];
  *   - time travel for free: every previous manifest remains readable
  *     (`readAt`) until `vacuum` expires it;
  *   - concurrent-writer safety: the manifest publish is the optimistic
  *     lock — publishing version N+1 fails if another writer got there
  *     first, and the merge recomputes against the new state and retries.
  *
  * All metadata and deletes go through the Hadoop `FileSystem` API
  * ([[graft.engine.Dfs]]), so the same table runs on local disk in tests
  * and HDFS/object storage on a cluster; the commit lock is
  * [[Dfs.renameOntoAbsent]] (rename with `Options.Rename.NONE` — atomic
  * fail-if-exists on HDFS, conditional-put on stores that support it),
  * not a POSIX hard link.
  *
  * Layout under `dir`:
  * {{{
  *   data/<commit-uuid>/__bucket=<b>/part-*.parquet   immutable
  *   manifests/v<%08d>.manifest                       text, atomic publish
  * }}}
  *
  * Manifest format (line-oriented, no parser dependency):
  * `version=N`, `nBuckets=B`, `keys=...`, `maxseq=S` (the table's applied
  * head seq — monotone; what [[SnapshotCatalog.commitAligned]] reads),
  * then one `b <bucket> <relative-path>` per
  * bucket present. Merge semantics (last-write-wins by seq, `__gen`
  * tie-break = the committing version, tombstoned deletes) match the other
  * sinks; `__gen` strictly increases per commit, so replaying a batch is
  * idempotent and out-of-order-safe.
  */
/** Manifest-format and bucket-routing primitives, shared between the Scala
  * sink API and the DSv2 read path ([[graft.sources.SnapshotTableProvider]])
  * so neither re-learns the layout.
  */
object SnapshotParquetSink {

  /** One dimension of a write-time clustering spec: rows route to buckets
    * by the Z-order (Morton) position of their clamped, `[lo, hi]`-scaled
    * value instead of by key hash — so each bucket covers a TIGHT rectangle
    * in cluster space and the manifest's per-bucket min/max stats prune
    * range predicates on EITHER column (the Delta `OPTIMIZE ZORDER` idea
    * applied at write time, composed from [[graft.engine.ZOrder]]).
    *
    * Bounds are declared once at table create and are part of the table's
    * committed layout (like `nBuckets`): routing must be a PURE function of
    * the column values forever, or a key would migrate between buckets
    * across merges. Out-of-bounds values clamp — they route to an edge
    * bucket, and pruning stays correct because stats always record the
    * bucket's ACTUAL content ranges.
    */
  final case class ClusterCol(name: String, lo: Long, hi: Long) {
    require(lo < hi, s"cluster bounds for '$name' need lo < hi (got $lo, $hi)")
  }

  /** Bits per dimension of the Z-code — fixed so the routing function is
    * part of the format: 20 bits/col keeps a 2-D code in 40 bits and
    * resolves any `nBuckets ≤ 2^20` per dimension.
    */
  private[sink] val ClusterBits = 20

  /** The cluster spec recorded at `version`; empty = hash-routed table. */
  def manifestCluster(dir: String, version: Long): Seq[ClusterCol] =
    Dfs.readUtf8(manifestPath(dir, version)).split('\n').toSeq
      .filter(_.startsWith("c "))
      .map { line =>
        val Array(_, n, lo, hi) = line.split(" ", 4)
        ClusterCol(n, lo.toLong, hi.toLong)
      }

  /** Column names land verbatim in the line-oriented manifest (`keys=a,b`
    * splits on commas; `s <b> <col> <mn> <mx>` splits on spaces), so a name
    * containing a space/comma/newline would shift every later field and
    * brick reads of the committed version (the [[SnapshotCatalog]]
    * `validName` mirror). Spark allows such column names; this format does
    * not — reject at commit time, before any data is written.
    */
  def validManifestName(kind: String)(n: String): Unit =
    require(n.nonEmpty && !n.exists(ch => ch.isWhitespace || ch == ','),
      s"$kind column '$n' contains whitespace/comma/newline — it would " +
        "corrupt the line-oriented manifest format; rename the column " +
        "before committing")

  /** Opens an EXISTING table with the layout its latest manifest records —
    * nBuckets, stats columns and cluster spec all adopted from the
    * committed state rather than re-declared by the caller. This is the
    * handle long-lived writers should construct per merge (a streaming
    * foreachBatch, an orchestrator worker): a concurrent [[rebucket]]
    * changes the committed bucket count, and a handle pinned to the old
    * count refuses its next merge by design — re-opening through this
    * factory self-aligns instead, so partition-count evolution never
    * wedges the pipeline. Errors when the table has no committed version
    * (creation declares the layout, so it goes through the constructor).
    */
  def forTable(dir: String): SnapshotParquetSink = {
    val v = versions(dir).lastOption.getOrElse(
      sys.error(s"no committed version at $dir — declare the layout via " +
        "the constructor for a new table"))
    new SnapshotParquetSink(dir, nBuckets = manifest(dir, v)._1,
      statsCols = declaredStatsCols(dir, v), clusterBy = manifestCluster(dir, v),
      bloomCols = declaredBloomCols(dir, v))
  }

  /** The table's DECLARED data-skipping columns at `version`: the explicit
    * `statscols=` / `bloomcols=` header line when present. Legacy manifests
    * (written before headers) fall back to inferring from the per-bucket
    * data lines — which UNDERSTATES the declaration when no bucket recorded
    * a line (every bucket all-null, or over [[BloomIndex.MaxDistinct]]);
    * the header exists so [[forTable]] writers never silently drop the
    * table's skipping configuration on that gap.
    */
  def declaredStatsCols(dir: String, version: Long): Seq[String] =
    headerCols(dir, version, "statscols=").getOrElse(
      manifestStats(dir, version).values.flatMap(_.keys).toSeq.distinct.sorted)

  /** Bloom twin of [[declaredStatsCols]]. */
  def declaredBloomCols(dir: String, version: Long): Seq[String] =
    headerCols(dir, version, "bloomcols=").getOrElse(
      manifestBlooms(dir, version).values.flatMap(_.keys).toSeq.distinct.sorted)

  private def headerCols(dir: String, version: Long,
      prefix: String): Option[Seq[String]] =
    manifestLines(dir, version).collectFirst { case l if l.startsWith(prefix) =>
      l.stripPrefix(prefix).split(',').toSeq.map(_.trim).filter(_.nonEmpty) }

  /** Absorbs the caller's delete-flag column into the internal
    * `__is_deleted` (null → false). When the flag column is literally named
    * `is_deleted` it is DROPPED from the data: that name is reserved by
    * Logical-mode reads (which rename `__is_deleted` back to `is_deleted`),
    * so persisting a literal copy would make every Logical read of the
    * table carry two `is_deleted` columns and break the next hop of a
    * [[graft.streaming.TableFollower]] chain with an ambiguous-reference
    * error. Any other flag name (`is_delete`, `__del`, …) stays in the data
    * unchanged — round-tripping it is harmless and callers may project it.
    */
  private[sink] def foldDeleteFlag(batch: DataFrame, isDeleteCol: String): DataFrame = {
    // loud, at WRITE time: a NON-flag data column named `is_deleted` would
    // be silently dropped by every Logical-mode read (the name is where
    // the tombstone flag resurfaces) — silent business-column loss. The
    // read-side drop stays for legacy files whose FLAG was persisted under
    // that name; new writes must rename or declare it as the flag.
    require(isDeleteCol == "is_deleted" || !batch.columns.contains("is_deleted"),
      s"column name 'is_deleted' is reserved by Logical-mode reads: a data " +
        s"column of that name (the declared flag is '$isDeleteCol') would " +
        "vanish on every Logical read — rename it before writing, or " +
        "declare it as the table's delete-flag column")
    val folded = batch.withColumn("__is_deleted",
      coalesce(col(isDeleteCol).cast("boolean"), lit(false)))
    if (isDeleteCol == "is_deleted") folded.drop("is_deleted") else folded
  }

  /** Outcome of the last successful [[SnapshotParquetSink.merge]] on a
    * handle: the published version, publish attempts, how many of those
    * attempts REBASED (reused the already-written data files onto a newer
    * manifest after losing the commit race to a writer of DISJOINT
    * buckets), and how many times the merge result was actually computed
    * and written (1 = no conflicting overlap ever forced a recompute).
    */
  final case class CommitInfo(version: Long, attempts: Int, rebases: Int,
      dataWrites: Int)

  /** Shared driver-side FS-op pool for [[inParallel]]: bounded daemon
    * threads created ONCE — a per-call `newFixedThreadPool` paid thread
    * creation on every invocation, which at the catalog's ~40 ms commit
    * budget was a measured ~20 ms regression per commit.
    */
  private val fsIoPoolName = "graft-fs-io"
  private lazy val fsIoPool = java.util.concurrent.Executors.newFixedThreadPool(
    32,
    (r: Runnable) => {
      val t = new Thread(r, fsIoPoolName)
      t.setDaemon(true)
      t
    })

  /** Order-preserving parallel map over driver-side FS round-trips
    * (sidecar writes/copies, catalog member metadata): each item is a
    * tiny-file/metadata operation whose latency, not bandwidth, dominates
    * — sequentially they scale O(buckets)/O(members). Exceptions propagate
    * to the caller (a failed sidecar write must abort the commit, same as
    * sequentially). A call issued FROM a pool task runs inline on the
    * caller's thread: a bounded shared pool must never wait on itself
    * (outer tasks holding every thread while their inner futures sit
    * queued behind them is a deadlock, not a slowdown), and no current
    * call site nests anyway — the guard makes the helper safe for future
    * call sites rather than relying on a doc-only contract.
    */
  private[graft] def inParallel[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    if (items.size <= 1 || Thread.currentThread().getName == fsIoPoolName)
      return items.map(f)
    // propagate the CALLER's active session into each task: pool threads
    // are created once and inherit the session thread-local of whichever
    // thread first populated the pool — without the per-task set, FS ops
    // on reused pool threads would resolve a long-stopped session's
    // Hadoop conf (Dfs.conf reads the active-session thread-local)
    val sess = org.apache.spark.sql.SparkSession.getActiveSession
    try {
      items.map(a => fsIoPool.submit(new java.util.concurrent.Callable[B] {
        def call(): B = {
          sess match {
            case Some(s) => org.apache.spark.sql.SparkSession.setActiveSession(s)
            case None => org.apache.spark.sql.SparkSession.clearActiveSession()
          }
          f(a)
        }
      })).map(_.get())
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  def manifestsDir(dir: String): HPath = new HPath(dir, "manifests")
  def manifestPath(dir: String, v: Long): HPath =
    new HPath(manifestsDir(dir), f"v$v%08d.manifest")

  /** All published versions at `dir`, ascending; empty before any commit. */
  def versions(dir: String): Seq[Long] =
    Dfs.list(manifestsDir(dir))
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted

  /** Bounded (dir, version) → lines cache. A published manifest is
    * IMMUTABLE (publish is rename-onto-absent), so a hit can never be
    * stale within a table's lifetime; the two mutation edges are handled
    * explicitly — [[publish]] installs the fresh body (covering
    * delete-tree-and-recreate fixtures reusing version numbers inside one
    * JVM), and vacuum evicts what it drops. Commits re-read the SAME
    * manifest ~a dozen times (layout guard, keys, seqcol, schema, maxseq,
    * stats, blooms, skip-cols, entries); locally that is parse churn, on
    * an object store it is a dozen GETs per commit.
    */
  private val manifestCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long), Seq[String]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long), Seq[String]]): Boolean =
          size() > 256
      })

  private[sink] def cacheManifest(dir: String, version: Long, body: String): Unit = {
    manifestCache.put((dir, version), body.split('\n').toSeq)
    ()
  }

  private[sink] def evictManifest(dir: String, version: Long): Unit = {
    manifestCache.remove((dir, version))
    ()
  }

  private def manifestLines(dir: String, version: Long): Seq[String] = {
    val k = (dir, version)
    val hit = manifestCache.get(k)
    if (hit != null) hit
    else {
      val lines = Dfs.readUtf8(manifestPath(dir, version)).split('\n').toSeq
      // cache only a COMPLETE body: under a put-style commit lock a racing
      // reader can observe the file before its content — that read must
      // stay transient (the caller fails/retries as before), never become
      // a pinned empty manifest
      if (lines.exists(_.startsWith("version="))) manifestCache.put(k, lines)
      lines
    }
  }

  /** (declared nBuckets, bucket → path relative to `dir`) at `version`. */
  def manifest(dir: String, version: Long): (Int, Map[Int, String]) = {
    val lines = manifestLines(dir, version)
    val n = lines.collectFirst { case l if l.startsWith("nBuckets=") =>
      l.stripPrefix("nBuckets=").toInt }
      .getOrElse(sys.error(s"manifest v$version at $dir lacks nBuckets"))
    val entries = lines.iterator.filter(_.startsWith("b ")).map { line =>
      val Array(_, b, rel) = line.split(" ", 3)
      b.toInt -> rel
    }.toMap
    (n, entries)
  }

  /** Bloom sidecar references recorded at `version`:
    * bucket → column → (stored-type DDL, sidecar path relative to `dir`).
    * The type is the column's type IN THE FILES the sidecar covers — a
    * reader casts its literal to it before hashing (xxhash64 hashes the
    * same logical value differently per type), so a BIGINT literal finds a
    * row stored as INT. Within one readable version the types cannot
    * actually diverge across buckets (parquet mergeSchema refuses
    * int/bigint mixes — widening goes through the replaceAll migration,
    * which recomputes every sidecar), but recording the type per line makes
    * the hash contract explicit and keeps readers correct across versions
    * with different types. Absence of a line means "unknown, cannot prune"
    * (all-null bucket, distinct count over [[BloomIndex.MaxDistinct]], or a
    * table written without bloomCols).
    */
  def manifestBlooms(dir: String,
      version: Long): Map[Int, Map[String, (String, String)]] =
    manifestLines(dir, version)
      .filter(_.startsWith("f "))
      .map { line =>
        val Array(_, b, c, ty, rel) = line.split(" ", 5)
        (b.toInt, c, (ty, rel))
      }
      .groupBy(_._1)
      .map { case (b, rows) => b -> rows.map(r => r._2 -> r._3).toMap }

  /** The table's FILE schema union recorded at `version` (JSON StructType;
    * includes `__gen` and the delete flag, excludes the `__bucket`
    * partition directory) — what `mergeSchema` over every bucket file
    * would reconstruct, recorded at commit time so READERS NEVER PAY A
    * FOOTER SCAN TO RESOLVE THE SCHEMA: at 100 TB, "open every bucket's
    * footer before planning" is a real planning-latency tax this line
    * removes (the Delta metaData-action idea). None for manifests written
    * before schema recording — consumers then fall back to the footer
    * merge. Every rewrite that reads the full state (compact, rebucket,
    * purge, replaceAll) records the line, upgrading legacy tables.
    */
  def manifestSchema(dir: String,
      version: Long): Option[org.apache.spark.sql.types.StructType] =
    manifestLines(dir, version)
      .collectFirst { case l if l.startsWith("schema=") =>
        org.apache.spark.sql.types.DataType.fromJson(l.stripPrefix("schema="))
          .asInstanceOf[org.apache.spark.sql.types.StructType] }

  /** The merge-key columns recorded at `version` (the columns the bucket
    * hash routes on). Empty for manifests written before keys were
    * recorded — consumers then fall back to caller-declared keys.
    */
  def manifestKeys(dir: String, version: Long): Seq[String] =
    manifestLines(dir, version)
      .collectFirst { case l if l.startsWith("keys=") =>
        l.stripPrefix("keys=").split(',').toSeq.map(_.trim).filter(_.nonEmpty) }
      .getOrElse(Seq.empty)

  /** The last-write-wins ORDER COLUMN recorded at `version` (`seqcol=`).
    * Written by merge/replaceAll from the caller's declared `seqCol` and
    * carried verbatim through full rewrites (compact/rebucket/purge), so
    * downstream consumers — `changesBetween`, the change-feed stream
    * source — resolve the table's real order column instead of assuming a
    * column literally named `seq`. A table whose order column is `ts` but
    * that also happens to carry an unrelated `seq` data column would
    * otherwise get a silently wrong diff (updates not touching that column
    * vanish). None for manifests written before recording — consumers then
    * fall back to the caller-supplied or default name.
    */
  def manifestSeqCol(dir: String, version: Long): Option[String] =
    manifestLines(dir, version)
      .collectFirst { case l if l.startsWith("seqcol=") =>
        l.stripPrefix("seqcol=").trim }
      .filter(_.nonEmpty)

  /** The applied-head seq recorded at `version`: the max `seqCol` this
    * table has merged up to and including that commit (monotone across
    * versions). None for manifests written before it was recorded. This is
    * the metadata [[SnapshotCatalog.commitAligned]] reads to build
    * seq-consistent cross-table cuts without scanning data files.
    */
  def manifestMaxSeq(dir: String, version: Long): Option[Long] =
    manifestLines(dir, version)
      .collectFirst { case l if l.startsWith("maxseq=") =>
        l.stripPrefix("maxseq=").toLong }

  /** Per-bucket column statistics recorded at `version`:
    * bucket → column → (min, max) as decimal strings (timestamps as epoch
    * micros). Only buckets/columns with a recorded `s` line appear —
    * consumers must treat absence as "unknown, cannot prune". Stats follow
    * the entries' carry-forward rule: untouched buckets keep the stats of
    * the commit that last wrote them, so a bucket's recorded `seq` max is
    * the last time its content changed — which is what makes
    * `WHERE seq > X` incremental reads skip cold buckets.
    *
    * TIMESTAMP_NTZ note: NTZ stats are pure wall-clock micros. A manifest
    * written by a pre-fix build in a non-UTC session would carry
    * zone-shifted NTZ ranges; no released table recorded any (the writer
    * and the fix shipped in the same round), but a table suspected of it
    * should `compact` once — the rewrite re-derives stats under the
    * current normalization.
    */
  def manifestStats(dir: String,
      version: Long): Map[Int, Map[String, (BigDecimal, BigDecimal)]] =
    manifestLines(dir, version)
      .filter(_.startsWith("s "))
      .map { line =>
        val Array(_, b, c, mn, mx) = line.split(" ", 5)
        (b.toInt, c, (BigDecimal(mn), BigDecimal(mx)))
      }
      .groupBy(_._1)
      .map { case (b, rows) => b -> rows.map(r => r._2 -> r._3).toMap }

  /** Per-column shift that maps a `[0, hi-lo]` offset onto the FULL
    * [[ClusterBits]]-bit code range — exact integer arithmetic, no
    * division: positive = shift right (span wider than the code), negative
    * = shift left (narrow span scaled up so the top-bits bucket selector
    * still discriminates).
    */
  private[sink] def clusterShift(c: ClusterCol): Int = {
    val spanBits = 64 - java.lang.Long.numberOfLeadingZeros(c.hi - c.lo)
    spanBits - ClusterBits
  }

  private[sink] def applyShift(x: Long, shift: Int): Long =
    if (shift >= 0) x >> shift else x << -shift

  /** Driver-side cluster routing, bit-identical to the write expression:
    * clamp to bounds (null ⇒ lo), subtract lo, shift to [[ClusterBits]]
    * bits, Morton-interleave, keep the top log2(nBuckets) bits — so
    * adjacent buckets are adjacent Z-tiles and a rectangle predicate
    * touches few of them.
    */
  private[graft] def clusterBucketFor(values: Seq[Option[Long]],
      spec: Seq[ClusterCol], nBuckets: Int): Int = {
    val codes = values.zip(spec).map { case (v, c) =>
      val clamped = math.min(math.max(v.getOrElse(c.lo), c.lo), c.hi)
      applyShift(clamped - c.lo, clusterShift(c))
    }
    val log2n = java.lang.Long.numberOfTrailingZeros(nBuckets.toLong)
    val z = codes match {
      case Seq(a) => a
      case Seq(a, b) =>
        (0 until ClusterBits).map { j =>
          (((a >> j) & 1L) << (2 * j)) + (((b >> j) & 1L) << (2 * j + 1))
        }.sum
      case _ => sys.error("clusterBy supports 1 or 2 columns")
    }
    val zBits = ClusterBits * spec.length
    (z >> (zBits - log2n)).toInt
  }

  /** A fold-merge lost its optimistic base check ([[SnapshotParquetSink
    * .mergeFold]]): the table's applied head moved while the delta was in
    * flight. The delta is NOT applied; recompute it against the current
    * head and retry.
    */
  final case class FoldBaseConflict(tableDir: String, expected: Long,
      found: Option[Long]) extends RuntimeException(
    s"fold-merge base conflict at $tableDir: delta computed against applied " +
      s"head $expected but the table records $found — recompute against the " +
      "current head and retry")

  /** Driver-side bucket routing, bit-identical to the write path's
    * `pmod(xxhash64(keys...), nBuckets)`: literals cast to the STORED key
    * types, XxHash64 evaluated without a Spark job.
    */
  def bucketFor(keyValues: Seq[Any],
      keyTypes: Seq[org.apache.spark.sql.types.DataType], nBuckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, XxHash64}
    val castLits = keyValues.zip(keyTypes).map { case (v, t) =>
      Cast(Literal(v), t, Some("UTC")): org.apache.spark.sql.catalyst.expressions.Expression
    }
    val h = new XxHash64(castLits.toIndexedSeq).eval(null).asInstanceOf[Long]
    (((h % nBuckets) + nBuckets) % nBuckets).toInt
  }
}

/** `statsCols`: numeric/timestamp columns to record per-bucket min/max for
  * in each commit's manifest — MANIFEST-LEVEL DATA SKIPPING (the Delta
  * data-skipping idea adapted to the incremental bucket layout): the DSv2
  * scan drops whole buckets whose recorded range excludes a pushed range/
  * equality predicate before any file is opened. On a hash-bucketed table
  * value ranges scatter, so the payoff is on columns CORRELATED WITH
  * COMMIT TIME — above all `seq`: untouched buckets keep the stats of the
  * commit that last rewrote them, so an incremental consumer's
  * `WHERE seq > X` plans only buckets that actually changed since X.
  * Stats cost one column-pruned read-back of the just-written files per
  * commit; tables written without stats read unchanged (absence = no
  * pruning).
  *
  * `bloomCols`: columns to build per-bucket BLOOM SIDECARS for
  * ([[BloomIndex]]) — equality file-skipping on non-key columns whose
  * values hash-scatter (where min/max stats prune nothing), plus
  * parquet-native row-group bloom filters inside every data file written.
  * `WHERE ext_id = 'X'` then plans only the buckets whose filter admits X.
  * Same cost/compat contract as stats: one extra distinct-hash pass over
  * the just-written files per commit, absence = no pruning.
  */
final class SnapshotParquetSink(val dir: String, nBuckets: Int = 16,
    statsCols: Seq[String] = Nil,
    clusterBy: Seq[SnapshotParquetSink.ClusterCol] = Nil,
    bloomCols: Seq[String] = Nil) extends UpsertSink {

  statsCols.foreach(SnapshotParquetSink.validManifestName("stats"))
  bloomCols.foreach(SnapshotParquetSink.validManifestName("bloom"))
  clusterBy.foreach(c => SnapshotParquetSink.validManifestName("cluster")(c.name))
  require(clusterBy.size <= 2, "clusterBy supports 1 or 2 columns (Z-order is 2-D here)")
  require(clusterBy.map(_.name).distinct.size == clusterBy.size,
    "clusterBy columns must be distinct")
  if (clusterBy.nonEmpty) {
    require((nBuckets & (nBuckets - 1)) == 0 && nBuckets > 0,
      s"a clustered table needs a power-of-two nBuckets (top Z-code bits " +
        s"are the bucket), got $nBuckets")
    require(java.lang.Long.numberOfTrailingZeros(nBuckets.toLong)
        <= SnapshotParquetSink.ClusterBits * clusterBy.length,
      s"nBuckets=$nBuckets exceeds the Z-code resolution for ${clusterBy.length} column(s)")
  }

  private def manifestsDir: HPath = SnapshotParquetSink.manifestsDir(dir)
  private def manifestPath(v: Long): HPath = SnapshotParquetSink.manifestPath(dir, v)

  /** `s <bucket> <col> <min> <max>` lines for the freshly-written commit
    * root: one column-pruned scan of the new files (never the whole
    * table), timestamps normalized to epoch micros so the manifest is a
    * plain decimal string. All-null buckets record no line (unknown).
    */
  private def statsLinesFor(spark: SparkSession, commitId: String): Seq[String] =
    statsLinesFor(spark, commitId, statsCols)

  private def statsLinesFor(spark: SparkSession, commitId: String,
      cols: Seq[String]): Seq[String] = {
    if (cols.isEmpty) return Nil
    val written = spark.read
      .option("basePath", s"$dir/data/$commitId").parquet(s"$dir/data/$commitId")
    val schema = written.schema
    cols.foreach { c =>
      require(schema.fieldNames.contains(c), s"stats column '$c' absent from the batch")
      val ok = schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType |
             org.apache.spark.sql.types.DateType => true
        case _ => false
      }
      require(ok, s"stats column '$c' must be numeric/timestamp/date " +
        s"(got ${schema(c).dataType}) — string ranges don't order portably")
    }
    def norm(c: String) = schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        unix_micros(col(c))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // pure wall-clock micros — casting NTZ through TIMESTAMP would
        // shift by the session zone and mismatch the pushed NTZ literal
        // (whose Catalyst value is the unshifted wall-clock micros)
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `$c`)")
      case org.apache.spark.sql.types.DateType => datediff(col(c), lit("1970-01-01"))
      case _ => col(c)
    }
    // a non-finite value (NaN/±Inf) has no decimal manifest form and no
    // orderable range: a bucket containing one records NO line for that
    // column (unknown → never pruned) — dropping just the value would
    // let a range predicate wrongly prune the bucket holding it
    def nonFinite(c: String) = schema(c).dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        max(when(isnan(col(c)) || abs(col(c)) === lit(Double.PositiveInfinity), 1)
          .otherwise(0))
      case _ => max(lit(0))
    }
    val aggs = cols.flatMap(c =>
      Seq(min(norm(c)).as(s"__mn_$c"), max(norm(c)).as(s"__mx_$c"),
        nonFinite(c).as(s"__nf_$c")))
    written.groupBy(col("__bucket")).agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.flatMap { row =>
        val b = row.getInt(0)
        cols.flatMap { c =>
          val mn = row.get(row.fieldIndex(s"__mn_$c"))
          val mx = row.get(row.fieldIndex(s"__mx_$c"))
          val nf = row.getInt(row.fieldIndex(s"__nf_$c"))
          if (mn == null || mx == null || nf == 1) None else Some(s"s $b $c $mn $mx")
        }
      }
  }

  /** Writer options enabling PARQUET-NATIVE bloom filters for `cols` on a
    * data write — row-group-level equality skipping INSIDE the files, the
    * layer that still pays off when a bucket's distinct count exceeds what
    * the manifest-level sidecar will cover ([[BloomIndex]]'s scaladoc).
    */
  /** Parquet-native bloom writing is EVIDENCE-GATED per commit: the
    * sidecar layer exactly covers buckets up to [[BloomIndex.MaxDistinct]]
    * distinct values, so the in-file row-group filters only ever prune
    * where a bucket has OUTGROWN the sidecar — and writing them
    * unconditionally was measured at ~0.21× bulk-commit overhead
    * (2M rows / 80 buckets, the whole gap between the fused sidecar
    * build's 0.08× and the 0.29× total) protecting nothing under the
    * recommended ≤25k-row bucket layout. A commit therefore writes the
    * native filters iff the PRIOR manifest shows a bloom-declared bucket
    * without a sidecar line (the build's saturation marker — also set by
    * all-null buckets and pre-declaration legacy buckets, an acceptable
    * conservative over-trigger): the first oversized commit goes
    * native-less (a missing filter prunes nothing, never wrongly) and
    * every later commit carries the native layer. `graft.bloom.forceNative`
    * forces the layer on (bench/test pin of the native-write cost).
    */
  private def nativeBloomsWanted(prior: Option[Long], cols: Seq[String]): Boolean =
    sys.props.contains("graft.bloom.forceNative") ||
      (cols.nonEmpty && prior.exists { v =>
        val blooms = SnapshotParquetSink.manifestBlooms(dir, v)
        readManifest(v).keys.exists(b =>
          cols.exists(c => !blooms.get(b).exists(_.contains(c))))
      })

  private def parquetBloomOptsFor(prior: Option[Long],
      cols: Seq[String]): Map[String, String] =
    if (nativeBloomsWanted(prior, cols)) parquetBloomOpts(cols) else Map.empty

  private def parquetBloomOpts(cols: Seq[String]): Map[String, String] =
    cols.flatMap(c => Seq(
      s"parquet.bloom.filter.enabled#$c" -> "true",
      // size for the recommended layout (~25k-row buckets, one row group
      // per bucket file): parquet's default assumes 1M NDV and allocates
      // ~1.2 MB of filter per chunk — measured to double the commit's
      // write cost while the sidecar layer already covers ≤64k-distinct
      // buckets exactly
      s"parquet.bloom.filter.expected.ndv#$c" -> BloomIndex.MaxDistinct.toString))
      .toMap

  private def bloomLinesFor(spark: SparkSession, commitId: String): Seq[String] =
    bloomLinesFor(spark, commitId, bloomCols)

  /** `statscols=` / `bloomcols=` header lines recording the commit's
    * EFFECTIVE skipping declaration: this handle's when it declares any,
    * else carried from `carryFrom`'s manifest — so a maintenance or
    * config-less writer never strips the table's declaration, and
    * [[SnapshotParquetSink.forTable]] recovers it even when no bucket
    * recorded a per-bucket data line. An explicitly empty header means
    * "declared none"; a missing header means legacy (infer from lines).
    */
  private def skipColsLines(carryFrom: Option[Long]): Seq[String] = {
    val st = if (statsCols.nonEmpty) statsCols
      else carryFrom.map(SnapshotParquetSink.declaredStatsCols(dir, _)).getOrElse(Nil)
    val bl = if (bloomCols.nonEmpty) bloomCols
      else carryFrom.map(SnapshotParquetSink.declaredBloomCols(dir, _)).getOrElse(Nil)
    Seq(s"statscols=${st.mkString(",")}", s"bloomcols=${bl.mkString(",")}")
  }

  /** `f <bucket> <col> <type> <rel>` manifest lines + their sidecar files
    * for the freshly written commit root — one column-pruned,
    * distinct-hash scan of the NEW files per bloom column, never the whole
    * table (the statsLinesFor contract). The heavy part (hash, position
    * explode, per-word bit OR) runs distributed; the driver collects only
    * the SPARSE set word array per bucket (≤16 K longs each, and only for
    * buckets under [[BloomIndex.MaxDistinct]] distinct values — larger
    * buckets record nothing and rely on the parquet-native blooms).
    */
  private def bloomLinesFor(spark: SparkSession, commitId: String,
      cols: Seq[String]): Seq[String] = {
    if (cols.isEmpty) return Nil
    val root = s"$dir/data/$commitId"
    val written = spark.read.option("basePath", root).parquet(root)
    val schema = written.schema
    cols.flatMap { c =>
      require(schema.fieldNames.contains(c), s"bloom column '$c' absent from the batch")
      val ddl = schema(c).dataType.catalogString
      require(!ddl.exists(_.isWhitespace),
        s"bloom column '$c' has a non-atomic type ($ddl) — bloom skipping " +
          "covers atomic columns (equality on them is what gets pushed down)")
      // ONE pass over the new files per bloom column: positions are set at
      // the MAXIMUM size, and a power-of-two bloom folds down EXACTLY
      // ((p mod 2^20) mod m = p mod m when m | 2^20 — the low log2(m) bits
      // are untouched), so per-bucket sizing needs no separate distinct
      // count: it reads the full-size filter's own fill. Duplicates just
      // re-set the same bits — a `.distinct()` materialization was measured
      // at 2.5× merge cost and a count_distinct pre-pass at ~1.4×, both
      // replaced by this fold-down. The position formula must stay
      // bit-identical to BloomIndex.position.
      val hashed = written.filter(col(c).isNotNull)
        .select(col("__bucket"), xxhash64(col(c)).as("__h"))
      locally {
        val h1 = col("__h").bitwiseAND(lit(0x7fffffffL))
        val h2 = shiftrightunsigned(col("__h"), 32)
          .bitwiseOR(lit(1L)).bitwiseAND(lit(0x7fffffffL))
        val positions = array((0 until BloomIndex.K).map(i =>
          pmod(h1 + lit(i.toLong) * h2, lit(BloomIndex.MaxBits.toLong))): _*)
        // sparse full-size words: ≤ min(k·rows, 2^20/64) rows per bucket —
        // tiny next to the batch; cached for the fill probe + the fold
        val sparse20 = hashed
          .select(col("__bucket"), explode(positions).as("__p"))
          .select(col("__bucket"), shiftright(col("__p"), 6).as("__w"),
            expr("shiftleft(cast(1 as bigint), cast(pmod(__p, 64) as int))")
              .as("__mask"))
          .groupBy(col("__bucket"), col("__w"))
          .agg(expr("bit_or(__mask)").as("__bits"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // distinct-count estimate from the full-size filter's fill —
          // the standard bloom inversion n̂ = −(m/k)·ln(1 − X/m); at the
          // 64k-distinct cap X/m ≈ 0.31, where the estimator is tight
          val fills = sparse20.groupBy(col("__bucket"))
            .agg(sum(bit_count(col("__bits"))).as("x"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          val m20 = BloomIndex.MaxBits.toDouble
          val ms = fills.toSeq.sortBy(_._1).flatMap { case (b, x) =>
            val nHat =
              if (x >= BloomIndex.MaxBits) Long.MaxValue // filter saturated
              else math.ceil(-m20 / BloomIndex.K * math.log1p(-x / m20)).toLong
            BloomIndex.sizeFor(nHat).map(b -> _)
          }
          if (ms.isEmpty) Nil
          else {
            // fold to each bucket's size: target word = w mod (m/64), bit
            // position within the word unchanged — exact, no re-hash
            val mdf = spark.createDataFrame(ms.map { case (b, m) =>
              org.apache.spark.sql.Row(b, (m / 64).toLong) }.asJava,
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("__bucket",
                  org.apache.spark.sql.types.IntegerType, nullable = false),
                org.apache.spark.sql.types.StructField("__wn",
                  org.apache.spark.sql.types.LongType, nullable = false))))
            val sparse = sparse20.join(broadcast(mdf), "__bucket")
              .groupBy(col("__bucket"), pmod(col("__w"), col("__wn")).as("__wt"))
              .agg(expr("bit_or(__bits)").as("__bits"))
              .collect()
            val byBucket = sparse.groupBy(_.getInt(0))
            // sidecar publication is O(buckets) tiny-file FS round-trips —
            // sequentially they dominated the whole bloom pass at O(100)
            // buckets (measured 1.6× bulk-commit overhead at 80 buckets);
            // write them concurrently, I/O-bound, bounded pool
            SnapshotParquetSink.inParallel(ms) { case (b, m) =>
              val words = new Array[Long](m / 64)
              byBucket.getOrElse(b, Array.empty).foreach { r =>
                words(r.getLong(1).toInt) = r.getLong(2)
              }
              val rel = s"data/$commitId/__bloom/$c/$b.bf"
              Dfs.writeBytes(new HPath(s"$dir/$rel"), BloomIndex.encode(m, words))
              s"f $b $c $ddl $rel"
            }
          }
        } finally {
          sparse20.unpersist()
          ()
        }
      }
    }
  }

  /** Bloom sidecars fused INTO the data-write job: the write frame gets an
    * `observe` with one [[graft.functions.BloomWordsAgg]] per bloom column,
    * so the per-bucket filter words accumulate while the parquet writer
    * streams the same rows — no re-read of fresh files, no extra jobs (the
    * pre-fusion build cost 1.5–2.1× of the plain commit; the bar is ≤1.2×).
    * The driver then only decodes the observed map and writes the sidecar
    * files (concurrent, I/O-bound — same publication as before).
    *
    * Used by the bulk paths (merge, replaceAll). Maintenance rewrites
    * (compact/purge/rebucket) keep the standalone [[bloomLinesFor]] re-read
    * or the sidecar copy — they are rare and whole-table by nature.
    */
  private final class ObservedBlooms(
      val frame: DataFrame,
      obs: Option[org.apache.spark.sql.Observation],
      cols: Seq[String]) {
    /** Sidecar files written + their `f` manifest lines; call AFTER the
      * write action completed (the observation resolves then).
      */
    def lines(commitId: String,
        schema: org.apache.spark.sql.types.StructType): Seq[String] =
      obs.toSeq.flatMap { o =>
        val row = o.get
        cols.flatMap { c =>
          val ddl = schema(c).dataType.catalogString
          val ents = (row(s"__bf_$c") match {
            case null => Seq.empty[(Any, Any)]
            case m: scala.collection.Map[_, _] => m.toSeq
          }).map { case (bk, v) =>
            val r = v.asInstanceOf[org.apache.spark.sql.Row]
            (bk.asInstanceOf[Int], r.getAs[Array[Byte]]("bf"))
          }.sortBy(_._1)
          SnapshotParquetSink.inParallel(ents) { case (b, bytes) =>
            val rel = s"data/$commitId/__bloom/$c/$b.bf"
            Dfs.writeBytes(new HPath(s"$dir/$rel"), bytes)
            s"f $b $c $ddl $rel"
          }
        }
      }
  }

  private def observeBlooms(spark: SparkSession, toWrite: DataFrame,
      schema: org.apache.spark.sql.types.StructType): ObservedBlooms =
    if (bloomCols.isEmpty) new ObservedBlooms(toWrite, None, Nil)
    else {
      graft.functions.GraftFunctions.register(spark)
      val aggs = bloomCols.map { c =>
        require(schema.fieldNames.contains(c),
          s"bloom column '$c' absent from the batch")
        val ddl = schema(c).dataType.catalogString
        require(!ddl.exists(_.isWhitespace),
          s"bloom column '$c' has a non-atomic type ($ddl) — bloom skipping " +
            "covers atomic columns (equality on them is what gets pushed down)")
        // null-gated: xxhash64(null) would hash the seed — a null must set
        // no bits (an equality probe never matches null). The hash itself
        // is PRECOMPUTED as a codegen'd projection column below: the
        // CollectMetrics accumulator evaluates its children INTERPRETED
        // per written row, and an interpreted xxhash64-over-string per row
        // was a measured slice of the fused build's overhead — as a bound
        // attribute it's one slot read
        call_function("graft_bloom_words", col("__bucket"),
          col(s"__graft_bfh_$c")).as(s"__bf_$c")
      }
      val obs = org.apache.spark.sql.Observation(
        s"graft-blooms-${UUID.randomUUID()}")
      val hashed = bloomCols.foldLeft(toWrite)((df, c) =>
        df.withColumn(s"__graft_bfh_$c",
          when(col(c).isNotNull, xxhash64(col(c)))))
      // the drop ABOVE the observe keeps the helper out of the written
      // files while CollectMetrics still sees it
      new ObservedBlooms(hashed.observe(obs, aggs.head, aggs.tail: _*)
        .drop(bloomCols.map(c => s"__graft_bfh_$c"): _*),
        Some(obs), bloomCols)
    }

  /** Carried/copied bloom lines for a maintenance rewrite (compact, purge):
    * per-bucket content is preserved (compact) or only shrinks (purge), so
    * the existing filters stay correct — purge's are merely conservative
    * over-approximations. The sidecar FILES are copied under the new commit
    * root so the invariant "an `f` line references the same root as its
    * bucket's `b` entry" (what makes vacuum's entry-derived root
    * reachability cover sidecars) survives the rewrite.
    */
  private def copyBloomsInto(base: Long, commitId: String,
      keptBuckets: Set[Int]): Seq[String] = {
    val toCopy = SnapshotParquetSink.manifestBlooms(dir, base).toSeq.sortBy(_._1)
      .filter { case (b, _) => keptBuckets(b) }
      .flatMap { case (b, cols) =>
        cols.toSeq.sortBy(_._1).map { case (c, (ty, rel)) => (b, c, ty, rel) }
      }
    SnapshotParquetSink.inParallel(toCopy) { case (b, c, ty, rel) =>
      val newRel = s"data/$commitId/__bloom/$c/$b.bf"
      Dfs.writeBytes(new HPath(s"$dir/$newRel"),
        Dfs.readBytes(new HPath(s"$dir/$rel")))
      s"f $b $c $ty $newRel"
    }
  }

  /** `schema=<json>` line for a commit writing frames shaped `written`
    * (the `__bucket` partition column is stripped — it never lands in the
    * files), unioned with the carry source's RECORDED schema: untouched
    * buckets may hold evolution-era columns this commit's affected set
    * never read, and dropping them from the line would misdeclare the
    * table. On a legacy table (carry source has no recorded schema) the
    * line is omitted rather than derived — deriving would cost exactly the
    * footer scan this line exists to remove; the next full rewrite
    * (compact/rebucket/purge/replaceAll) upgrades it. A same-name type
    * conflict cannot arise through the supported evolution paths (merge
    * only ADDS columns; widening rewrites the whole table) and fails
    * loudly if it ever appears.
    */
  private def schemaLine(written: org.apache.spark.sql.types.StructType,
      carryFrom: Option[Long]): Option[String] = {
    import org.apache.spark.sql.types.StructType
    val fileSchema = StructType(written.fields.filterNot(_.name == "__bucket"))
    val prior = carryFrom.flatMap(v => SnapshotParquetSink.manifestSchema(dir, v))
    if (carryFrom.isDefined && prior.isEmpty) None
    else {
      val out = prior match {
        case None => fileSchema
        case Some(p) =>
          val byName = fileSchema.fields.map(f => f.name -> f).toMap
          p.fields.foreach(f => byName.get(f.name).foreach(n =>
            require(n.dataType == f.dataType,
              s"schema conflict on '${f.name}' at $dir: batch ${n.dataType} vs " +
                s"recorded ${f.dataType} — type changes go through replaceAll")))
          StructType(fileSchema.fields ++ p.fields.filterNot(f => byName.contains(f.name)))
      }
      Some("schema=" + out.json)
    }
  }

  /** Routing: key hash by default; on a clustered table, the top
    * log2(nBuckets) bits of the Morton code over the cluster columns —
    * Z-tiles instead of hash scatter, so per-bucket stats envelopes are
    * tight rectangles and range predicates prune. Cluster columns must be
    * MERGE KEYS: key values are the row's identity and never change, which
    * is exactly the stability routing needs (a value column could move a
    * key between buckets on update, leaving a stale live copy behind).
    */
  private def bucketOf(keys: Seq[String]) = bucketExpr(keys, nBuckets)

  private def bucketExpr(keys: Seq[String], n: Int) =
    if (clusterBy.isEmpty)
      pmod(xxhash64(keys.map(col): _*), lit(n)).cast("int")
    else {
      clusterBy.foreach(c => require(keys.contains(c.name),
        s"cluster column '${c.name}' must be one of the merge keys " +
          s"${keys.mkString(",")} — routing must be stable per key"))
      val codes = clusterBy.map { c =>
        val clamped = greatest(least(coalesce(col(c.name).cast("long"),
          lit(c.lo)), lit(c.hi)), lit(c.lo))
        val off = clamped - lit(c.lo)
        val sh = SnapshotParquetSink.clusterShift(c)
        if (sh >= 0) shiftright(off, sh) else shiftleft(off, -sh)
      }
      val z = codes match {
        case Seq(a) => a
        case Seq(a, b) =>
          graft.engine.ZOrder.interleave2(a, b, SnapshotParquetSink.ClusterBits)
      }
      val zBits = SnapshotParquetSink.ClusterBits * clusterBy.length
      val log2n = java.lang.Long.numberOfTrailingZeros(n.toLong)
      shiftright(z, zBits - log2n).cast("int")
    }

  /** `c <name> <lo> <hi>` manifest lines declaring this handle's layout. */
  private def clusterLines: Seq[String] =
    clusterBy.map(c => s"c ${c.name} ${c.lo} ${c.hi}")

  /** A clustered table written by a hash-routing handle (or with different
    * bounds) would scatter keys across incompatible bucket routings — the
    * same silent corruption the nBuckets guard exists for.
    */
  private def requireClusterMatch(v: Long): Unit = {
    val committed = SnapshotParquetSink.manifestCluster(dir, v)
    require(committed == clusterBy,
      s"sink clusterBy=$clusterBy but the table at $dir was committed with " +
        s"clusterBy=$committed — construct the sink with the table's spec")
  }

  /** All published versions, ascending; empty before the first commit. */
  /** This handle's bucket-layout width — cost models divide table bytes by
    * it to price a bucket-pruned read.
    */
  def bucketCount: Int = nBuckets

  def versions: Seq[Long] = SnapshotParquetSink.versions(dir)

  def currentVersion: Option[Long] = versions.lastOption

  /** bucket → path relative to `dir`. */
  private def readManifest(v: Long): Map[Int, String] =
    SnapshotParquetSink.manifest(dir, v)._2

  /** Writes the manifest body to a temp file and publishes it at `version`
    * through the pluggable commit lock ([[graft.engine.CommitLock]] — the
    * LogStore seam; rename-onto-absent by default, put-if-absent under a
    * coordinator on object stores). True = this writer owns the version;
    * false = lost the race (temp cleaned up, data root left for the caller
    * to delete).
    */
  private def publish(version: Long, commitId: String, body: String): Boolean = {
    Dfs.mkdirs(manifestsDir)
    val tmp = new HPath(manifestsDir, s".tmp-$commitId")
    Dfs.writeUtf8(tmp, body)
    val won = graft.engine.CommitLock.current.publishOntoAbsent(tmp, manifestPath(version))
    if (!won) Dfs.delete(tmp)
    // a win installs the authoritative body (also refreshing any stale
    // entry left by a delete-tree-and-recreate of the same table path)
    else SnapshotParquetSink.cacheManifest(dir, version, body)
    won
  }

  @volatile private var lastCommitInfo: Option[SnapshotParquetSink.CommitInfo] = None

  /** Outcome telemetry of this handle's last successful [[merge]] —
    * concurrency tests and operators assert the DISJOINT-writer fast path
    * (rebases ≥ 1, dataWrites == 1) actually engaged.
    */
  def lastCommit: Option[SnapshotParquetSink.CommitInfo] = lastCommitInfo

  override def merge(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String): Unit =
    mergeImpl(batch, keys, seqCol, isDeleteCol, None, None, None)

  /** [[merge]] where matching keys COMBINE through a caller-provided
    * aggregation instead of last-write-wins replacement — the LSM
    * "merge operator" idea (RocksDB mergeOp, Druid/Pinot ingestion rollup)
    * on the manifest-committed bucket layout: the incoming batch carries
    * DELTAS, and the fold happens INSIDE the affected-bucket rewrite the
    * commit already pays, so advancing an aggregate costs zero extra reads
    * of the table ([[MaterializedAgg]]'s pure-delta refresh rides this).
    *
    * `reduce` receives the union of the affected buckets' current rows and
    * the incoming batch (columns: the stored schema plus `__bucket`,
    * `__gen`, `__is_deleted`) and must return EXACTLY ONE row per key,
    * preserving `__bucket`, `__gen`, `__is_deleted` and `seqCol`.
    *
    * UNLIKE last-write-wins, folding is NOT replay-idempotent: applying the
    * same delta twice double-counts. Callers gate replays on the recorded
    * applied head (`maxseq`), and `requireBaseSeq` makes the gate atomic
    * with the commit: the publish aborts with [[SnapshotParquetSink
    * .FoldBaseConflict]] unless the table's recorded head still equals the
    * head the delta was computed against — a concurrent refresher (or a
    * crashed-then-raced replay) can never double-apply; it recomputes
    * against the new head and retries. Maintenance rewrites that keep the
    * head (compact) pass the guard and the fold proceeds on their state.
    */
  def mergeFold(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String, requireBaseSeq: Option[Long])(
      reduce: DataFrame => DataFrame): Unit =
    mergeImpl(batch, keys, seqCol, isDeleteCol, Some(reduce), requireBaseSeq, None)

  /** [[merge]] under the optimistic applied-head guard: throws
    * [[SnapshotParquetSink.FoldBaseConflict]] when the table's recorded
    * maxseq moved off `requireBaseSeq` — for callers whose batch carries
    * ABSOLUTE values computed FROM the stored state at that head (a moved
    * head means another writer advanced the state; last-write-wins over
    * stale absolutes would silently lose its update). Delta-shaped twins
    * combine inside the rewrite instead ([[mergeFold]]); absolute twins
    * catch the conflict and retry from a re-read.
    *
    * Dedup semantics under the guard: the batch is AUTHORITATIVE for its
    * keys (replace-by-key — held base ⇒ the absolutes supersede whatever
    * the bucket stores for those keys, and callers stamp seq at-or-above
    * the head anyway), executed as a broadcast anti-join instead of the
    * plain merge's whole-bucket window sort. Batches must be key-unique.
    */
  def mergeGuarded(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String, requireBaseSeq: Option[Long]): Unit =
    mergeImpl(batch, keys, seqCol, isDeleteCol, None, requireBaseSeq, None)

  /** [[mergeGuarded]] with the probe PRECOMPUTED: callers that already
    * know the batch's affected buckets and applied head (the IVM fold
    * derives both from its own dirty-group probe) skip the merge's probe
    * job — one fewer fixed-latency action per refresh. The hint contract
    * is EXACTNESS, enforced after the write by comparing the written
    * bucket directories against the hint (one driver-side listing): a
    * missing bucket would otherwise publish a manifest entry pointing at
    * an unwritten file, an extra one would orphan written rows — both
    * silent corruption, so a mismatch fails the commit loudly.
    */
  def mergeGuardedHinted(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String, requireBaseSeq: Option[Long],
      affectedBuckets: Array[Int], batchMaxSeq: Option[Long]): Unit =
    mergeImpl(batch, keys, seqCol, isDeleteCol, None, requireBaseSeq,
      Some((affectedBuckets, batchMaxSeq)))

  /** The commit probe — the batch's affected-bucket list and applied head
    * — as ONE single-stage job, no shuffle: a per-partition fold over the
    * two probe columns, combined on the driver (≤ nPartitions tiny
    * triples). The former groupBy().agg() shape paid an exchange plus one
    * AQE stage-job per exchange — measured 3 driver-job round trips per
    * micro-commit for a 2-value answer. This action is also what
    * materializes the incoming persist, exactly as before.
    */
  private def probeBucketsAndHead(incoming0: DataFrame,
      seqCol: String): (Array[Int], Option[Long]) = {
    val parts = incoming0.select(col("__bucket"), col(seqCol).cast("long"))
      .queryExecution.toRdd.mapPartitions { it =>
        val seen = new scala.collection.mutable.BitSet()
        var mx = Long.MinValue
        var any = false
        while (it.hasNext) {
          val r = it.next()
          seen += r.getInt(0)
          if (!r.isNullAt(1)) {
            val v = r.getLong(1)
            if (v > mx) mx = v
            any = true
          }
        }
        Iterator.single((seen, any, mx))
      }.collect()
    val bs = parts.iterator.map(_._1)
      .foldLeft(new scala.collection.mutable.BitSet())(_ |= _)
    val mxs = parts.iterator.filter(_._2).map(_._3)
    (bs.toArray, if (mxs.isEmpty) None else Some(mxs.max))
  }

  private def mergeImpl(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String, reduceOpt: Option[DataFrame => DataFrame],
      requireBaseSeq: Option[Long],
      probeHint: Option[(Array[Int], Option[Long])]): Unit = synchronized {
    val dbg = new graft.engine.Dbg("graft.commit.debug", "[commit]")
    keys.foreach(SnapshotParquetSink.validManifestName("key"))
    val spark = batch.sparkSession
    val incoming0 = SnapshotParquetSink.foldDeleteFlag(batch, isDeleteCol)
      .withColumn("__bucket", bucketOf(keys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE probe job: the affected-bucket list (≤ nBuckets values by
      // construction — the driver-side list that limits the read and
      // rewrite to affected buckets only) AND the batch's applied head
      // (recorded in the manifest, monotone across commits, so catalog
      // seq-aligned cuts read metadata, not data; all-null seq contributes
      // no head). Separate jobs here doubled the fixed per-job latency on
      // every micro-commit — the q61 lifecycle tail is merge-count-bound.
      // A caller-provided hint skips even this one job (exactness enforced
      // against the written bucket dirs below).
      val (affected, batchMaxSeq) = probeHint match {
        case Some((bs, mx)) => (bs.sorted, mx)
        case None =>
          dbg("probe")(graft.engine.JobTag(spark, "commit:probe") {
            probeBucketsAndHead(incoming0, seqCol) })
      }
      if (affected.isEmpty) return

      /** Layout guards against the manifest at `v`: a writer with a
        * different bucket count or key set would scatter keys across
        * incompatible bucket routings — the corruption would be SILENT
        * (wrong rows per bucket file), so mismatches fail loudly. Re-run
        * per publish attempt: a concurrent rebucket/recluster between
        * attempts changes the answer.
        */
      def guardLayout(v: Long): Unit = {
        val declared = SnapshotParquetSink.manifest(dir, v)._1
        require(declared == nBuckets,
          s"sink nBuckets=$nBuckets but the table at $dir was committed with " +
            s"nBuckets=$declared — construct the sink with the table's value")
        val priorKeys = SnapshotParquetSink.manifestKeys(dir, v)
        require(priorKeys.isEmpty || priorKeys == keys,
          s"merge keys ${keys.mkString(",")} do not match the table's committed " +
            s"keys ${priorKeys.mkString(",")} at $dir")
        // the order column is part of the layout contract too: two writers
        // merging under different LWW columns produce an undefined winner
        val priorSeq = SnapshotParquetSink.manifestSeqCol(dir, v)
        require(priorSeq.forall(_ == seqCol),
          s"seqCol '$seqCol' does not match the table's committed order " +
            s"column '${priorSeq.getOrElse("")}' at $dir")
        requireClusterMatch(v)
      }

      var attempts = 0
      var rebases = 0
      var dataWrites = 0
      var committed = false
      while (!committed) {
        val base = currentVersion
        // fold merges: the optimistic base check — the delta was computed
        // against a specific applied head; a moved head means some other
        // writer advanced the state and folding now would double-apply
        requireBaseSeq.foreach { rb =>
          val prior = base.flatMap(v => SnapshotParquetSink.manifestMaxSeq(dir, v))
          if (!prior.contains(rb))
            throw SnapshotParquetSink.FoldBaseConflict(dir, rb, prior)
        }
        val entries = base.map(readManifest).getOrElse(Map.empty)
        base.foreach(guardLayout)

        // existing state of the affected buckets, grouped by commit root:
        // each root was written with partitionBy("__bucket"), so reading
        // with basePath=root recovers the bucket column; roots from
        // different commits may differ in schema (evolution) — union by
        // name. Read under the manifest's RECORDED schema when present
        // (zero footer IO — the readAt rule; explicit-schema reads
        // null-fill evolution-era files exactly like mergeSchema resolved
        // them, and __bucket comes back as the appended partition column);
        // legacy manifests keep the footer merge.
        val recordedSchema = base.flatMap(v =>
          SnapshotParquetSink.manifestSchema(dir, v))
        val existing = affected.flatMap(b => entries.get(b).map(rel => (b, rel)))
          .groupBy { case (_, rel) => rel.substring(0, rel.indexOf("/__bucket=")) }
        val current = existing.values.toSeq.sortBy(_.head._2).map { group =>
          val root = s"$dir/${group.head._2.substring(0, group.head._2.indexOf("/__bucket="))}"
          val rdr = recordedSchema match {
            case Some(rec) => spark.read.schema(rec)
            case None      => spark.read.option("mergeSchema", "true")
          }
          rdr.option("basePath", root)
            .parquet(group.map { case (_, rel) => s"$dir/$rel" }: _*)
        }.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))

        // __gen = the version this computation TARGETS. A rebase publishes
        // these files at a HIGHER version with the gen left as-is — safe
        // because rebase requires every affected bucket untouched by the
        // winners: a key lives in exactly one bucket, so the stale gen can
        // only ever tie-break against gens from commits at or below `base`,
        // which are strictly smaller.
        val targetVersion = base.map(_ + 1L).getOrElse(0L)
        val incoming = incoming0.withColumn("__gen", lit(targetVersion))
        // the one-file-per-bucket layout shuffle, applied BELOW the dedup/
        // fold instead of above the write: __bucket is a function of the
        // merge keys, so hash-partitioning by __bucket alone already
        // clusters every key's rows into one partition — a window over
        // (__bucket +: keys) and the fold's groupBy(__bucket +: groups)
        // are then exchange-free on top of it (ClusteredDistribution is
        // satisfied by a subset partitioning), where the old shape paid a
        // second full exchange: keys-window-shuffle THEN bucket-repartition
        // (one exchange per micro-commit saved, plus its AQE stage-job).
        // Parallelism note: the dedup now runs at affected-bucket
        // granularity, the same granularity the per-bucket file write
        // always ran at — bounded by the recommended small-bucket layout.
        lazy val all = (current match {
          case Some(c) => c.unionByName(incoming, allowMissingColumns = true)
          case None    => incoming
        }).repartition(affected.length, col("__bucket"))
        val merged = (reduceOpt, requireBaseSeq) match {
          case (Some(reduce), _) => reduce(all)
          case (None, Some(_)) =>
            // guarded-ABSOLUTE contract: the batch's rows were computed
            // FROM the stored state at the guarded head (checked above and
            // re-checked per publish attempt) and stamped at-or-above it,
            // so the batch is authoritative for its keys — LWW reduces to
            // replace-by-key. A broadcast anti-join of the carried state
            // against the (small-by-design: dirty groups) incoming keys
            // replaces the window dedup, which shuffled AND sorted the
            // entire affected-bucket content on every fold refresh.
            (current match {
              case None => incoming
              case Some(c) =>
                val inKeys = broadcast(
                  incoming.select(keys.map(col): _*).distinct())
                c.join(inKeys,
                    keys.map(k => c(k) <=> inKeys(k)).reduce(_ && _),
                    "left_anti")
                  .unionByName(incoming, allowMissingColumns = true)
            }).repartition(affected.length, col("__bucket"))
          case (None, None) =>
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy((col("__bucket") +: keys.map(col)): _*)
              .orderBy(col(seqCol).desc, col("__gen").desc)
            all.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
        }

        val commitId = UUID.randomUUID().toString
        // one output file per bucket: every branch above is already
        // partitioned by __bucket into affected.length partitions
        val toWrite = merged
        // bloom sidecars build INSIDE the write job (observe + the
        // BloomWordsAgg imperative aggregate): zero extra reads of the
        // fresh files, zero extra jobs — the pre-fusion two-job build was
        // measured at 1.5–2.1× bulk-commit overhead
        val obs = observeBlooms(spark, toWrite, merged.schema)
        dbg("write")(graft.engine.JobTag(spark, "commit:write") {
          obs.frame.write.mode("overwrite").partitionBy("__bucket")
            .options(parquetBloomOptsFor(base, bloomCols))
            .parquet(s"$dir/data/$commitId") })
        dataWrites += 1
        // hinted probes are trusted into the manifest — verify the written
        // bucket dirs match EXACTLY (one driver-side listing): a hinted
        // bucket with no written dir would publish an entry pointing at a
        // missing file; an unhinted written dir would orphan those rows
        probeHint.foreach { _ =>
          val written = Dfs.list(new HPath(s"$dir/data/$commitId"))
            .map(_.getPath.getName).filter(_.startsWith("__bucket="))
            .map(_.stripPrefix("__bucket=").toInt).toSet
          if (written != affected.toSet) {
            // drop the never-published write before surfacing — the other
            // abort paths (FoldBaseConflict, overlap-abandon) do the same,
            // and a retrying caller must not leak one bucket-rewrite tree
            // per attempt until a vacuum runs
            Dfs.deleteTreeQuiet(new HPath(s"$dir/data/$commitId"))
            throw new IllegalArgumentException(
              s"probe hint mismatch at $dir: hinted buckets " +
                s"${affected.mkString(",")} but the write produced " +
                s"${written.toSeq.sorted.mkString(",")} — the caller's " +
                "affected-bucket precomputation is wrong")
          }
        }
        // data-derived manifest lines depend only on the written files —
        // computed once, reused verbatim across rebase attempts
        val freshStats = dbg("stats")(graft.engine.JobTag(spark, "commit:stats") {
          statsLinesFor(spark, commitId) })
        val freshBlooms = dbg("blooms")(graft.engine.JobTag(spark, "commit:blooms") {
          obs.lines(commitId, merged.schema) })

        // publish loop: first attempt carries from `base`; a lost race
        // against writers of DISJOINT buckets rebases — re-carries from the
        // winners' manifest and republishes the SAME data files (no
        // recompute, no rewrite); an overlapping winner invalidates the
        // computation and falls back to the outer recompute loop
        var abandoned = false
        var carryFrom = base
        while (!committed && !abandoned) {
          attempts += 1
          val version = carryFrom.map(_ + 1L).getOrElse(0L)
          val carryEntries = carryFrom.map(readManifest).getOrElse(Map.empty)
          val newEntries = carryEntries ++
            affected.map(b => b -> s"data/$commitId/__bucket=$b")
          // prior head: recorded metadata, or — for a table whose manifests
          // predate maxseq recording — ONE upgrade scan of the stored state
          // (recording only the batch's max would UNDERSTATE the head and
          // hand commitAligned a cut whose state reaches past it)
          val priorMaxSeq: Option[Long] = carryFrom.flatMap { v =>
            SnapshotParquetSink.manifestMaxSeq(dir, v).orElse(
              Option(readAt(spark, v, DeleteMode.Logical)
                .agg(max(col(seqCol).cast("long"))).head().get(0))
                .map(_.asInstanceOf[Long]))
          }
          // fold merges re-check the base on every carry source: a rebase
          // re-carries from winners whose state may include another
          // refresher's fold of the same delta
          requireBaseSeq.foreach { rb =>
            if (!priorMaxSeq.contains(rb)) {
              Dfs.deleteTreeQuiet(new HPath(s"$dir/data/$commitId"))
              throw SnapshotParquetSink.FoldBaseConflict(dir, rb, priorMaxSeq)
            }
          }
          val maxSeqOpt: Option[Long] = (batchMaxSeq.toSeq ++ priorMaxSeq.toSeq)
            .reduceOption((a: Long, b: Long) => math.max(a, b))
          // stats/bloom carry-forward mirrors the entries': untouched
          // buckets keep the lines of the commit that last wrote them
          val priorStats = carryFrom.map(v => SnapshotParquetSink.manifestStats(dir, v))
            .getOrElse(Map.empty)
          val carried = (priorStats -- affected).toSeq.sortBy(_._1).flatMap {
            case (b, cols) => cols.toSeq.sortBy(_._1).map {
              case (c, (mn, mx)) => s"s $b $c $mn $mx" } }
          val priorBlooms = carryFrom
            .map(v => SnapshotParquetSink.manifestBlooms(dir, v))
            .getOrElse(Map.empty)
          val carriedBlooms = (priorBlooms -- affected).toSeq.sortBy(_._1).flatMap {
            case (b, cols) => cols.toSeq.sortBy(_._1).map {
              case (c, (ty, rel)) => s"f $b $c $ty $rel" } }
          val body = (Seq(s"version=$version", s"nBuckets=$nBuckets",
            s"keys=${keys.mkString(",")}", s"seqcol=$seqCol") ++
            maxSeqOpt.map(m => s"maxseq=$m").toSeq ++
            schemaLine(merged.schema, carryFrom).toSeq ++
            skipColsLines(carryFrom) ++
            clusterLines ++
            newEntries.toSeq.sortBy(_._1).map { case (b, rel) => s"b $b $rel" } ++
            carried ++ freshStats ++
            carriedBlooms ++ freshBlooms)
            .mkString("", "\n", "\n")
          if (publish(version, commitId, body)) {
            committed = true
            lastCommitInfo = Some(SnapshotParquetSink.CommitInfo(
              version, attempts, rebases, dataWrites))
          } else {
            if (attempts >= 10)
              sys.error(s"snapshot commit lost the race $attempts times at $dir")
            val cur = currentVersion.getOrElse(
              sys.error(s"lost the commit race at $dir but no version is " +
                "published — another writer's manifest vanished mid-race"))
            // rebase precondition: the winners changed NEITHER the layout
            // (bucket count / keys / cluster spec — guardLayout) NOR any
            // bucket this computation read (its entry must still be what
            // our base read) — then the merged files remain the correct
            // next state of exactly those buckets
            guardLayout(cur)
            val curEntries = readManifest(cur)
            val disjoint = affected.forall(b => curEntries.get(b) == entries.get(b))
            if (disjoint) {
              rebases += 1
              carryFrom = Some(cur)
            } else {
              // best-effort: the orphan is unreferenced scratch — a
              // transient delete failure must not abort the retry (vacuum
              // collects it)
              Dfs.deleteTreeQuiet(new HPath(s"$dir/data/$commitId"))
              abandoned = true
              // jittered backoff: two writers in lockstep (each merge takes
              // about as long as the other's) can otherwise starve one side
              // for many consecutive versions
              Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
                .nextLong(10L, 100L * attempts))
            }
          }
        }
      }
    } finally {
      incoming0.unpersist()
      ()
    }
  }

  /** Truncate-and-load as ONE fresh commit: the published manifest lists
    * only this load's buckets — prior entries are dropped, not carried
    * forward — so the new version's state and column TYPES come from the
    * batch alone (the type-widening contract), while every older version
    * stays time-travel-readable under its own types. Publishes through the
    * same rename-onto-absent lock as [[merge]]; a lost race re-publishes
    * the same content at the next version (the batch is the whole truth —
    * nothing to recompute).
    */
  override def replaceAll(batch: DataFrame, keys: Seq[String], seqCol: String,
      isDeleteCol: String): Unit = synchronized {
    keys.foreach(SnapshotParquetSink.validManifestName("key"))
    val spark = batch.sparkSession
    val incoming0 = SnapshotParquetSink.foldDeleteFlag(batch, isDeleteCol)
      .withColumn("__bucket", bucketOf(keys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one probe job for bucket list + applied head (see merge)
      val (affected, batchMaxSeq) = probeBucketsAndHead(incoming0, seqCol)
      require(affected.nonEmpty,
        s"replaceAll with an empty batch would publish an unreadable empty table at $dir")
      require(batchMaxSeq.isDefined,
        s"replaceAll batch carries no orderable $seqCol values — the rebuilt " +
          "table would record no applied head, and a later commitAligned " +
          "would silently pin the superseded pre-replace version")
      var attempts = 0
      while (true) {
        attempts += 1
        val base = currentVersion
        val version = base.map(_ + 1L).getOrElse(0L)
        base.foreach { v =>
          val declared = SnapshotParquetSink.manifest(dir, v)._1
          require(declared == nBuckets,
            s"sink nBuckets=$nBuckets but the table at $dir was committed with " +
              s"nBuckets=$declared — construct the sink with the table's value")
          val priorKeys = SnapshotParquetSink.manifestKeys(dir, v)
          require(priorKeys.isEmpty || priorKeys == keys,
            s"replaceAll keys ${keys.mkString(",")} do not match the table's committed " +
              s"keys ${priorKeys.mkString(",")} at $dir")
          requireClusterMatch(v)
        }
        val incoming = incoming0.withColumn("__gen", lit(version))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col(seqCol).desc, col("__gen").desc)
        val merged = incoming.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val commitId = UUID.randomUUID().toString
        val toWrite = merged.repartition(affected.length, col("__bucket"))
        // same in-write bloom fusion as merge (see observeBlooms)
        val obs = observeBlooms(spark, toWrite, merged.schema)
        obs.frame.write.mode("overwrite").partitionBy("__bucket")
          .options(parquetBloomOptsFor(base, bloomCols))
          .parquet(s"$dir/data/$commitId")
        val newEntries = affected.map(b => b -> s"data/$commitId/__bucket=$b")
        val body = (Seq(s"version=$version", s"nBuckets=$nBuckets",
          s"keys=${keys.mkString(",")}", s"seqcol=$seqCol") ++
          batchMaxSeq.map(m => s"maxseq=$m").toSeq ++
          schemaLine(merged.schema, None).toSeq ++
          skipColsLines(base) ++
          clusterLines ++
          newEntries.sortBy(_._1).map { case (b, rel) => s"b $b $rel" } ++
          statsLinesFor(spark, commitId) ++
          obs.lines(commitId, merged.schema))
          .mkString("", "\n", "\n")
        if (publish(version, commitId, body)) {
          return
        } else {
          deleteTree(new HPath(s"$dir/data/$commitId"))
          if (attempts >= 10)
            sys.error(s"replaceAll lost the race $attempts times at $dir")
          Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
            .nextLong(10L, 100L * attempts))
        }
      }
    } finally {
      incoming0.unpersist()
      ()
    }
  }

  override def read(spark: SparkSession, mode: DeleteMode): DataFrame =
    readAt(spark, currentVersion.getOrElse(sys.error(s"no snapshot published at $dir")), mode)

  /** The committed state AS OF `version` — time travel. Fails loudly if the
    * manifest was vacuumed or never existed.
    */
  def readAt(spark: SparkSession, version: Long, mode: DeleteMode): DataFrame = {
    require(Dfs.exists(manifestPath(version)),
      s"snapshot v$version does not exist at $dir (vacuumed or never published)")
    val paths = readManifest(version).toSeq.sortBy(_._1).map { case (_, rel) => s"$dir/$rel" }
    shape(readWithKnownSchema(spark, version, paths), mode)
  }

  /** Bucket-routing column for rows keyed by this handle's layout —
    * bit-identical to the write path's routing ([[bucketOf]]), exposed so
    * a reader joining against a BOUNDED key set can compute which buckets
    * those keys live in and prune its own read to them (the IVM fold
    * regime's stored-view read rides this: ~20 dirty groups → ≤20 bucket
    * files instead of the whole view).
    */
  def bucketRouting(keys: Seq[String]): org.apache.spark.sql.Column = bucketOf(keys)

  /** [[readAt]] restricted to the listed buckets — the manifest turns a
    * dirty-bucket set into a file list, so the scan is |buckets|/nBuckets
    * of the table. Callers own the correctness argument that every row
    * they need routes into `buckets` under [[bucketRouting]].
    */
  def readAtBuckets(spark: SparkSession, version: Long, buckets: Set[Int],
      mode: DeleteMode): DataFrame = {
    require(Dfs.exists(manifestPath(version)),
      s"snapshot v$version does not exist at $dir (vacuumed or never published)")
    val paths = readManifest(version).toSeq.sortBy(_._1)
      .collect { case (b, rel) if buckets(b) => s"$dir/$rel" }
    if (paths.isEmpty) readAt(spark, version, mode).filter(lit(false))
    else shape(readWithKnownSchema(spark, version, paths), mode)
  }

  /** Total bytes of `version`'s manifest-listed bucket entries — the cheap
    * driver-side size proxy cost-based refresh decisions run on (FS
    * metadata only, no data IO, no footer reads). Entries are bucket
    * DIRECTORIES, so this is a content summary per entry, not a flat
    * status (a directory's own status length is ~0 and would undercount
    * the table by 1000×).
    */
  def bytesAt(version: Long): Long =
    readManifest(version).valuesIterator.map { rel =>
      try Dfs.contentSummary(new HPath(s"$dir/$rel"))._2
      catch { case _: java.io.IOException => 0L }
    }.sum

  /** Plan a read of `paths` (files of `version`'s manifest) under the
    * version's RECORDED schema when present — skipping the mergeSchema
    * footer scan entirely: at scale, schema resolution must be O(1)
    * metadata, not O(files) footer reads (and locally each skipped footer
    * job shaves fixed latency off every readAt/readChangedAt of the
    * merge-heavy lifecycle paths). The recorded schema is the union across
    * commits with per-column type conflicts refused at write time, so an
    * explicit-schema read null-fills evolution-era files exactly like
    * mergeSchema resolved them. Legacy manifests (no schema line) keep the
    * footer merge.
    */
  private def readWithKnownSchema(spark: SparkSession, version: Long,
      paths: Seq[String]): DataFrame =
    SnapshotParquetSink.manifestSchema(dir, version) match {
      case Some(recorded) => spark.read.schema(recorded).parquet(paths: _*)
      case None => spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }

  private def shape(t0: DataFrame, mode: DeleteMode): DataFrame = {
    val t = t0.drop("__gen", "__bucket")
    mode match {
      case DeleteMode.Hard    => t.filter(!col("__is_deleted")).drop("__is_deleted")
      // 'is_deleted' is RESERVED by Logical mode: drop a literal column of
      // that name (legacy files written before foldDeleteFlag absorbed it)
      // before the rename — otherwise a multi-hop follower chain reads two
      // 'is_deleted' columns and the next merge dies on ambiguous reference
      case DeleteMode.Logical =>
        t.drop("is_deleted").withColumnRenamed("__is_deleted", "is_deleted")
    }
  }

  /** Version `version`'s bucket files that DIFFER from version `other`'s
    * manifest entry for the same bucket. Buckets sharing a file between the
    * two manifests are byte-identical: a keyed diff between the versions
    * can skip them on BOTH sides (keys route to the same bucket under one
    * layout), so change feeds and IVM refreshes scan CHANGED buckets, not
    * the table. A layout change (rebucket, compaction, replaceAll) makes
    * every entry differ — correct, just unpruned.
    */
  def changedEntriesAt(version: Long, other: Long): Seq[String] = {
    val theirs = readManifest(other)
    readManifest(version).toSeq.sortBy(_._1).collect {
      case (b, rel) if !theirs.get(b).contains(rel) => s"$dir/$rel"
    }
  }

  /** The state at `version` restricted to buckets that differ from `other`
    * (see [[changedEntriesAt]]) — the diff-side read for change feeds and
    * IVM refreshes. None when the versions share every file (no possible
    * change). Schema = the version's RECORDED schema (zero footer IO; the
    * slice carries every table column, with evolution-era files
    * null-filled), falling back to mergeSchema over the changed files on
    * legacy manifests — where a caller needing an evolution-era column
    * absent from old changed files checks `columns` and falls back to
    * [[readAt]].
    */
  def readChangedAt(spark: SparkSession, version: Long, other: Long,
      mode: DeleteMode): Option[DataFrame] =
    changedEntriesAt(version, other) match {
      case Nil => None
      case paths =>
        // recorded-schema read: changed slices carry EVERY table column
        // (evolution-era files null-fill), so consumers' "changed files
        // predate a column" full-read fallbacks no longer trigger — the
        // slice is always transform-complete
        Some(shape(readWithKnownSchema(spark, version, paths), mode))
    }

  /** Point lookup against the LATEST snapshot, reading only the key's
    * bucket file — manifest + hash layout turn a key probe into one
    * 1/nBuckets-of-the-table read. Bucket derivation is bit-identical to
    * the write path ([[PartitionedParquetSink.lookup]]'s contract): literals
    * cast to the STORED key types, xxhash64 evaluated driver-side, no Spark
    * job for the routing decision. A never-merged sink yields an empty
    * zero-column frame.
    *
    * Contract (shared with the write path): key columns must keep a STABLE
    * type across merges. xxhash64 hashes the same logical value differently
    * per data type, so a retyped key column would scatter one logical key
    * across buckets at WRITE time already — schema evolution is supported
    * for value columns only, never the merge keys.
    */
  def lookup(spark: SparkSession, keys: Seq[String], keyValues: Seq[Any],
      mode: DeleteMode = DeleteMode.Hard): DataFrame = {
    require(keys.length == keyValues.length, "one value per key column")
    def shaped(df: DataFrame): DataFrame = mode match {
      case DeleteMode.Hard    => df.filter(!col("__is_deleted")).drop("__is_deleted")
      case DeleteMode.Logical => // 'is_deleted' reserved by Logical mode (see shape)
        df.drop("is_deleted").withColumnRenamed("__is_deleted", "is_deleted")
    }
    currentVersion match {
      case None => spark.emptyDataFrame
      case Some(v) =>
        // route the way the table was WRITTEN — the committed manifest's
        // nBuckets and cluster spec are authoritative, not this handle's
        // constructor arguments: a handle built with a different bucket
        // count would otherwise probe the WRONG bucket and silently return
        // "absent" for live keys (merge guards divergence at write time;
        // lookup is read-only and must self-align instead)
        val (committedN, entries) = SnapshotParquetSink.manifest(dir, v)
        // recorded schema when present (zero footer IO — the readAt rule);
        // legacy manifests sample one file's footer as before
        val sample = SnapshotParquetSink.manifestSchema(dir, v) match {
          case Some(rec) =>
            spark.read.schema(rec).parquet(s"$dir/${entries.head._2}").drop("__gen")
          case None =>
            spark.read.parquet(s"$dir/${entries.head._2}").drop("__gen")
        }
        val schema = sample.schema
        val committedCluster = SnapshotParquetSink.manifestCluster(dir, v)
        val bucket =
          if (committedCluster.isEmpty)
            SnapshotParquetSink.bucketFor(
              keyValues, keys.map(k => schema(k).dataType), committedN)
          else {
            val byName = keys.zip(keyValues).toMap
            val longs = committedCluster.map { c =>
              require(byName.contains(c.name),
                s"lookup must provide cluster key '${c.name}'")
              Option(byName(c.name)).map {
                case l: Long => l
                case i: Int => i.toLong
                case s: Short => s.toLong
                case b: Byte => b.toLong
                case other => sys.error(
                  s"cluster key '${c.name}' must be integral, got $other")
              }
            }
            SnapshotParquetSink.clusterBucketFor(longs, committedCluster, committedN)
          }
        entries.get(bucket.toInt) match {
          case None => shaped(sample.limit(0))
          case Some(rel) =>
            val t = (SnapshotParquetSink.manifestSchema(dir, v) match {
              case Some(rec) => spark.read.schema(rec).parquet(s"$dir/$rel")
              case None => spark.read.option("mergeSchema", "true").parquet(s"$dir/$rel")
            }).drop("__gen")
            shaped(keys.zip(keyValues).foldLeft(t) { case (df, (k, kv)) => df.filter(col(k) === kv) })
        }
    }
  }

  /** Change data feed between two committed versions — "what changed since
    * I last read" for downstream consumers (the Delta CDF / Iceberg
    * incremental-read analog), derived from the two snapshots themselves so
    * it works on ANY pair of retained versions, including across
    * compactions: per merge key, `insert` (live in v2 only), `delete`
    * (live in v1, gone or tombstoned in v2), `update` (live in both with a
    * different last-write `seqCol` — the sink stores the winning seq per
    * key, so value-equality never needs column-wise comparison). Output:
    * the key columns, `change`, `seq_from` (null for insert), `seq_to`
    * (null for delete).
    *
    * Scale shape: both sides read only the buckets whose FILE differs
    * between the two manifests ([[readChangedAt]] — shared files are
    * byte-identical and keys route to the same bucket under one layout),
    * column-pruned to key+seq; the full outer join shuffles on the merge
    * key — the same join any consumer-side diff pays, but over two
    * changed-bucket projections instead of full snapshots.
    */
  def changesBetween(spark: SparkSession, fromVersion: Long, toVersion: Long,
      seqColOverride: Option[String] = None): DataFrame = {
    require(fromVersion < toVersion,
      s"changesBetween needs fromVersion < toVersion, got $fromVersion >= $toVersion")
    val keys = SnapshotParquetSink.manifestKeys(dir, toVersion)
    require(keys.nonEmpty,
      s"the table at $dir records no merge keys (pre-keys-recording manifest)")
    // the RECORDED order column governs (the manifest is the contract a
    // table with an unrelated data column named `seq` relies on); the
    // override and the literal-`seq` fallback serve pre-recording tables
    val seqCol = seqColOverride
      .orElse(SnapshotParquetSink.manifestSeqCol(dir, toVersion))
      .getOrElse("seq")
    def live(v: Long, other: Long) = readChangedAt(spark, v, other, DeleteMode.Hard)
      .getOrElse(readAt(spark, v, DeleteMode.Hard).filter(lit(false)))
      .select(keys.map(col) :+ col(seqCol): _*)
    // explicit existence flags: the sink accepts all-null seq ("contributes
    // no head"), so presence must NOT be inferred from seq nullability — a
    // key live on both sides with a NULL seq would otherwise read as
    // insert/delete, and NULL⇄value transitions would vanish from `update`
    // under three-valued `=!=`
    val a = keys.foldLeft(live(fromVersion, toVersion)
        .withColumnRenamed(seqCol, "seq_from")
        .withColumn("__a_present", lit(true))) {
      (df, k) => df.withColumnRenamed(k, s"__a_$k") }
    val b = keys.foldLeft(live(toVersion, fromVersion)
        .withColumnRenamed(seqCol, "seq_to")
        .withColumn("__b_present", lit(true))) {
      (df, k) => df.withColumnRenamed(k, s"__b_$k") }
    val cond = keys.map(k => col(s"__a_$k") <=> col(s"__b_$k")).reduce(_ && _)
    val joined = a.join(b, cond, "full_outer")
    val change = when(col("__a_present").isNull, lit("insert"))
      .when(col("__b_present").isNull, lit("delete"))
      .when(!(col("seq_from") <=> col("seq_to")), lit("update"))
    val keyCols = keys.map(k => coalesce(col(s"__b_$k"), col(s"__a_$k")).as(k))
    joined
      .select(keyCols ++ Seq(change.as("change"), col("seq_from"), col("seq_to")): _*)
      .filter(col("change").isNotNull) // unchanged keys (same seq) drop out
  }

  /** The whole committed state at `base`, grouped per commit root so
    * mixed-schema roots (evolution) union by name — the shared read for
    * whole-table rewrites (compact, tombstone purge).
    */
  private def readFullState(spark: SparkSession, base: Long): DataFrame = {
    val entries = readManifest(base)
    entries.toSeq.sortBy(_._1)
      .groupBy { case (_, rel) => rel.substring(0, rel.indexOf("/__bucket=")) }
      .toSeq.sortBy(_._1).map { case (root, group) =>
        spark.read.option("mergeSchema", "true").option("basePath", s"$dir/$root")
          .parquet(group.map { case (_, rel) => s"$dir/$rel" }: _*)
      }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Rewrites the whole current state as ONE fresh commit: every bucket's
    * file moves under a single new root, so after history expires
    * (`vacuum`) the table holds exactly nBuckets files regardless of how
    * many incremental commits built it — the periodic maintenance step of
    * any log-structured table format (small-file and manifest-spread
    * control). Publishes through the same rename-onto-absent lock as merge;
    * a lost race (someone merged concurrently) recomputes from their state.
    * Returns the published version.
    */
  def compact(spark: SparkSession): Long = synchronized {
    var attempts = 0
    while (true) {
      attempts += 1
      val base = currentVersion.getOrElse(sys.error(s"nothing to compact at $dir"))
      val entries = readManifest(base)
      val version = base + 1L
      val full = readFullState(spark, base)
      val commitId = UUID.randomUUID().toString
      // bloom columns (handle's, or whatever the base manifest recorded):
      // the rewrite keeps the parquet-native row-group blooms where the
      // base manifest evidences saturated buckets (parquetBloomOptsFor)
      val baseBloomCols = SnapshotParquetSink.manifestBlooms(dir, base)
        .values.flatMap(_.keys).toSeq.distinct.sorted
      val effBloomCols = if (bloomCols.nonEmpty) bloomCols else baseBloomCols
      full.repartition(entries.size, col("__bucket"))
        .write.mode("overwrite").partitionBy("__bucket")
        .options(parquetBloomOptsFor(Some(base), effBloomCols))
        .parquet(s"$dir/data/$commitId")
      val newEntries = entries.keys.map(b => b -> s"data/$commitId/__bucket=$b")
      // carry the recorded merge keys forward — compaction rewrites data
      // files, never the key contract
      val baseKeys = SnapshotParquetSink.manifestKeys(dir, base)
      val baseMaxSeq = SnapshotParquetSink.manifestMaxSeq(dir, base)
      // per-bucket content is preserved exactly, so ranges carry verbatim
      val carried = SnapshotParquetSink.manifestStats(dir, base).toSeq.sortBy(_._1)
        .flatMap { case (b, cols) => cols.toSeq.sortBy(_._1).map {
          case (c, (mn, mx)) => s"s $b $c $mn $mx" } }
      // ... and so do the bloom sidecars (files copied under the new root —
      // the same-root-as-entry invariant vacuum reachability relies on).
      // EXCEPT when this handle declares bloomCols: then compaction is also
      // the index BACKFILL path — recompute for every bucket, which is how
      // a table bulk-loaded without blooms (the fast initial load) gains
      // them afterwards in one maintenance pass
      val bloomsOut =
        if (bloomCols.nonEmpty) bloomLinesFor(spark, commitId)
        else copyBloomsInto(base, commitId, entries.keySet)
      // compaction rewrites files, never the routing — cluster spec carries
      val carriedCluster = SnapshotParquetSink.manifestCluster(dir, base)
        .map(c => s"c ${c.name} ${c.lo} ${c.hi}")
      val body = (Seq(s"version=$version", s"nBuckets=$nBuckets",
        s"keys=${baseKeys.mkString(",")}") ++
        SnapshotParquetSink.manifestSeqCol(dir, base).map(s => s"seqcol=$s") ++
        baseMaxSeq.map(m => s"maxseq=$m").toSeq ++
        schemaLine(full.schema, None).toSeq ++ // full rewrite: derive fresh
        skipColsLines(Some(base)) ++
        carriedCluster ++
        newEntries.toSeq.sortBy(_._1).map { case (b, rel) => s"b $b $rel" } ++
        carried ++ bloomsOut)
        .mkString("", "\n", "\n")
      if (publish(version, commitId, body)) {
        return version
      } else {
        Dfs.deleteTreeQuiet(new HPath(s"$dir/data/$commitId"))
        if (attempts >= 10) sys.error(s"compaction lost the race $attempts times at $dir")
        Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
          .nextLong(10L, 100L * attempts))
      }
    }
    -1L // unreachable
  }

  /** Re-buckets the whole table to `newBuckets` as ONE fresh commit — the
    * PARTITION-COUNT EVOLUTION a hash/Z layout eventually needs: a table
    * sized at 16 buckets at launch drowns under 100× growth (GB-scale
    * bucket files make every touched-bucket rewrite GB-scale too), and a
    * shrunk table wastes opens on near-empty files. Content is preserved
    * exactly; every key re-routes under the new count (same hash / Z
    * formula, new selector width), stats are RECOMPUTED for the columns
    * the base manifest recorded (carried ranges describe the OLD bucket
    * partition — wrong for the new one), and the cluster spec carries
    * (bounds are value-space, independent of bucket count). Older versions
    * stay time-travel-readable under their own recorded nBuckets — which
    * is why readers resolve nBuckets per manifest, never from a handle.
    * Writer handles constructed with the old count refuse on their next
    * merge (the nBuckets guard) — construct new ones. Publishes through
    * the same commit lock; returns the published version.
    */
  def rebucket(spark: SparkSession, newBuckets: Int): Long = synchronized {
    require(newBuckets > 0, "newBuckets must be positive")
    if (clusterBy.nonEmpty) {
      require((newBuckets & (newBuckets - 1)) == 0,
        s"a clustered table needs a power-of-two bucket count, got $newBuckets")
      require(java.lang.Long.numberOfTrailingZeros(newBuckets.toLong)
          <= SnapshotParquetSink.ClusterBits * clusterBy.length,
        s"newBuckets=$newBuckets exceeds the Z-code resolution")
    }
    var attempts = 0
    while (true) {
      attempts += 1
      val base = currentVersion.getOrElse(sys.error(s"nothing to rebucket at $dir"))
      val version = base + 1L
      val baseKeys = SnapshotParquetSink.manifestKeys(dir, base)
      require(baseKeys.nonEmpty,
        s"the table at $dir records no merge keys — rebucket cannot derive routing")
      requireClusterMatch(base)
      val full = readFullState(spark, base).drop("__bucket")
        .withColumn("__bucket", bucketExpr(baseKeys, newBuckets))
      val commitId = UUID.randomUUID().toString
      // bloom sidecars must be RECOMPUTED (values re-partition across the
      // new bucket set — carried filters would describe the old partition)
      val baseBloomCols = SnapshotParquetSink.manifestBlooms(dir, base)
        .values.flatMap(_.keys).toSeq.distinct.sorted
      val effBloomCols = if (bloomCols.nonEmpty) bloomCols else baseBloomCols
      // native blooms for the rewrite are decided by the NEW geometry, not
      // the prior manifest: rebucket re-partitions values, so prior
      // saturation evidence describes buckets that no longer exist (a
      // shrink can saturate every new bucket of a previously all-healthy
      // table, which would otherwise ship sidecar-less AND native-less).
      // A bucket whose ROW count stays ≤ MaxDistinct cannot saturate any
      // column's sidecar (distinct ≤ rows) — one column-pruned count job
      // over the re-routed state decides, exact in the skip direction and
      // conservatively over-triggering only on heavily duplicated columns.
      val nativeOpts =
        if (effBloomCols.isEmpty) Map.empty[String, String]
        else if (sys.props.contains("graft.bloom.forceNative"))
          parquetBloomOpts(effBloomCols)
        else {
          val maxBucketRows = Option(full.groupBy(col("__bucket")).count()
            .agg(max("count")).head().get(0)).map(_.asInstanceOf[Long])
          if (maxBucketRows.exists(_ > BloomIndex.MaxDistinct))
            parquetBloomOpts(effBloomCols)
          else Map.empty[String, String]
        }
      full.repartition(newBuckets, col("__bucket"))
        .write.mode("overwrite").partitionBy("__bucket")
        .options(nativeOpts)
        .parquet(s"$dir/data/$commitId")
      val writtenBuckets = Dfs.list(new HPath(s"$dir/data/$commitId"))
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("__bucket=") =>
          n.stripPrefix("__bucket=").toInt }
        .sorted
      val newEntries = writtenBuckets.map(b => b -> s"data/$commitId/__bucket=$b")
      val baseMaxSeq = SnapshotParquetSink.manifestMaxSeq(dir, base)
      // stats recomputed for whatever the base recorded (this maintenance
      // handle may not declare statsCols; the table's skipping metadata
      // must survive regardless)
      val baseStatCols = SnapshotParquetSink.manifestStats(dir, base)
        .values.flatMap(_.keys).toSeq.distinct.sorted
      val statCols = if (statsCols.nonEmpty) statsCols else baseStatCols
      val body = (Seq(s"version=$version", s"nBuckets=$newBuckets",
        s"keys=${baseKeys.mkString(",")}") ++
        SnapshotParquetSink.manifestSeqCol(dir, base).map(s => s"seqcol=$s") ++
        baseMaxSeq.map(m => s"maxseq=$m").toSeq ++
        schemaLine(full.schema, None).toSeq ++ // full rewrite: derive fresh
        skipColsLines(Some(base)) ++
        clusterLines ++
        newEntries.map { case (b, rel) => s"b $b $rel" } ++
        statsLinesFor(spark, commitId, statCols) ++
        bloomLinesFor(spark, commitId, effBloomCols))
        .mkString("", "\n", "\n")
      if (publish(version, commitId, body)) {
        return version
      } else {
        Dfs.deleteTreeQuiet(new HPath(s"$dir/data/$commitId"))
        if (attempts >= 10) sys.error(s"rebucket lost the race $attempts times at $dir")
        Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
          .nextLong(10L, 100L * attempts))
      }
    }
    -1L // unreachable
  }

  /** Drops tombstones whose delete event is at or below `horizonSeq`, as
    * ONE fresh commit — the delete-retention compaction every
    * infinite-retention upsert store eventually needs (Kafka log
    * compaction's `delete.retention.ms` analog): tombstones exist to beat
    * replayed/out-of-order pre-delete events by seq, so one is safely
    * droppable exactly when no event with a smaller seq can still arrive —
    * `horizonSeq` is that replay horizon (a committed checkpoint offset, a
    * source retention bound). Purging above the horizon would let a
    * replayed stale update resurrect a deleted row; this keeps those.
    * Live rows are untouched. Returns the published version.
    *
    * Stats/keys handling mirrors [[compact]], except stats are RECOMPUTED
    * (content shrank; carried ranges would stay conservative-safe but
    * recomputing keeps pruning tight).
    */
  def purgeTombstones(spark: SparkSession, horizonSeq: Long,
      seqColDefault: String = "seq"): Long = synchronized {
    var attempts = 0
    while (true) {
      attempts += 1
      val base = currentVersion.getOrElse(sys.error(s"nothing to purge at $dir"))
      // the recorded order column governs the horizon comparison; the
      // parameter is the pre-recording fallback
      val seqCol = SnapshotParquetSink.manifestSeqCol(dir, base)
        .getOrElse(seqColDefault)
      val entries = readManifest(base)
      val version = base + 1L
      val full = readFullState(spark, base)
      // pre-maxseq table: derive the true head from the PRE-purge state
      // (tombstones included) — deriving it later from the purged state
      // would understate it and hand commitAligned a cut the table is past
      val headSeq: Option[Long] = SnapshotParquetSink.manifestMaxSeq(dir, base)
        .orElse(Option(full.agg(max(col(seqCol).cast("long"))).head().get(0))
          .map(_.asInstanceOf[Long]))
      // coalesce(true): a NULL-seq tombstone makes the predicate NULL and a
      // plain filter would DROP it regardless of horizon — unknown seq
      // must conservatively survive the purge
      val purged = full.filter(
        coalesce(!(col("__is_deleted") && col(seqCol) <= horizonSeq), lit(true)))
      val commitId = UUID.randomUUID().toString
      val baseBloomCols = SnapshotParquetSink.manifestBlooms(dir, base)
        .values.flatMap(_.keys).toSeq.distinct.sorted
      val effBloomCols = if (bloomCols.nonEmpty) bloomCols else baseBloomCols
      purged.repartition(entries.size, col("__bucket"))
        .write.mode("overwrite").partitionBy("__bucket")
        .options(parquetBloomOptsFor(Some(base), effBloomCols))
        .parquet(s"$dir/data/$commitId")
      // a bucket whose every row was a purged tombstone writes no dir —
      // list what actually landed instead of assuming the old bucket set
      val writtenBuckets = Dfs.list(new HPath(s"$dir/data/$commitId"))
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("__bucket=") =>
          n.stripPrefix("__bucket=").toInt }
        .sorted
      if (writtenBuckets.isEmpty) {
        // the whole table was horizon-old tombstones: publishing a
        // zero-entry manifest would leave an UNREADABLE head (the
        // replaceAll guard's condition) — refuse; drop the table instead
        deleteTree(new HPath(s"$dir/data/$commitId"))
        sys.error(s"purge at $dir would empty the table entirely " +
          "(every row is a horizon-old tombstone) — delete the table " +
          "instead of publishing an unreadable empty version")
      }
      val newEntries = writtenBuckets.map(b => b -> s"data/$commitId/__bucket=$b")
      val baseKeys = SnapshotParquetSink.manifestKeys(dir, base)
      // stats: recompute when this handle records them; otherwise CARRY the
      // base's lines for surviving buckets — purge only removes rows, so
      // prior ranges stay valid over-approximations, and a maintenance
      // handle constructed without statsCols must not silently strip the
      // table's data-skipping metadata
      val statsOut =
        if (statsCols.nonEmpty) statsLinesFor(spark, commitId)
        else {
          val kept = writtenBuckets.toSet
          SnapshotParquetSink.manifestStats(dir, base).toSeq.sortBy(_._1)
            .filter { case (b, _) => kept(b) }
            .flatMap { case (b, cols) => cols.toSeq.sortBy(_._1).map {
              case (c, (mn, mx)) => s"s $b $c $mn $mx" } }
        }
      // purge removes rows, never the routing — cluster spec carries; bloom
      // sidecars COPY for surviving buckets (content only shrank, so the
      // existing filters stay safe over-approximations of what remains)
      val carriedCluster = SnapshotParquetSink.manifestCluster(dir, base)
        .map(c => s"c ${c.name} ${c.lo} ${c.hi}")
      val copiedBlooms = copyBloomsInto(base, commitId, writtenBuckets.toSet)
      val body = (Seq(s"version=$version", s"nBuckets=$nBuckets",
        s"keys=${baseKeys.mkString(",")}") ++
        SnapshotParquetSink.manifestSeqCol(dir, base).map(s => s"seqcol=$s") ++
        headSeq.map(m => s"maxseq=$m").toSeq ++
        schemaLine(purged.schema, None).toSeq ++ // full rewrite: derive fresh
        skipColsLines(Some(base)) ++
        carriedCluster ++
        newEntries.sortBy(_._1).map { case (b, rel) => s"b $b $rel" } ++
        statsOut ++ copiedBlooms)
        .mkString("", "\n", "\n")
      if (publish(version, commitId, body)) {
        return version
      } else {
        Dfs.deleteTreeQuiet(new HPath(s"$dir/data/$commitId"))
        if (attempts >= 10) sys.error(s"purge lost the race $attempts times at $dir")
        Thread.sleep(java.util.concurrent.ThreadLocalRandom.current()
          .nextLong(10L, 100L * attempts))
      }
    }
    -1L // unreachable
  }

  /** Version history as a DataFrame — the DESCRIBE HISTORY analog, read
    * from manifests alone (one small-file read per retained version, never
    * a data scan): version, publish time, bucket count, live entry count,
    * applied-head seq, merge keys, cluster spec, and how many bucket
    * entries each commit actually REWROTE vs carried forward (rewritten ≈
    * the commit's write amplification; a long run of 1-entry commits is
    * the signal to compact).
    */
  def history(spark: SparkSession): DataFrame = {
    val vs = versions
    val rows = vs.map { v =>
      val (n, entries) = SnapshotParquetSink.manifest(dir, v)
      val prev = if (v == vs.head) Map.empty[Int, String]
        else SnapshotParquetSink.manifest(dir, vs(vs.indexOf(v) - 1))._2
      val rewritten = entries.count { case (b, rel) => prev.get(b) != Some(rel) }
      val cluster = SnapshotParquetSink.manifestCluster(dir, v)
        .map(c => s"${c.name}[${c.lo},${c.hi}]").mkString(",")
      org.apache.spark.sql.Row(
        v,
        new java.sql.Timestamp(
          Dfs.fs(manifestPath(v)).getFileStatus(manifestPath(v)).getModificationTime),
        n,
        entries.size,
        rewritten,
        SnapshotParquetSink.manifestMaxSeq(dir, v).map(Long.box).orNull,
        SnapshotParquetSink.manifestKeys(dir, v).mkString(","),
        cluster)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("published", TimestampType, nullable = false),
        StructField("n_buckets", IntegerType, nullable = false),
        StructField("entries", IntegerType, nullable = false),
        StructField("rewritten", IntegerType, nullable = false),
        StructField("maxseq", LongType, nullable = true),
        StructField("keys", StringType, nullable = false),
        StructField("cluster", StringType, nullable = false))))
  }

  /** Expires history: keeps the newest `keepLast` manifests, deletes older
    * ones plus every data directory no kept manifest references. Unreferenced
    * roots are deleted only when older than `minOrphanAgeMs` — an
    * unreferenced NEW directory may be another writer's in-flight commit
    * (fully written, manifest not yet published); deleting it would corrupt
    * the commit the moment it publishes. The default hour dwarfs any real
    * write-to-publish window; crashed-commit orphans (data roots AND
    * `.tmp-*` manifest leftovers) are collected on the next vacuum after
    * aging out. Returns (manifests deleted, data roots deleted).
    */
  /** Versions the last vacuum WANTED to drop but withheld under the
    * manifest age floor — lets operators distinguish "nothing to drop"
    * from "too young to drop" ((0, 0) from [[vacuum]] is ambiguous).
    */
  @volatile var lastVacuumWithheld: Int = 0

  def vacuum(keepLast: Int = 1, minOrphanAgeMs: Long = 3600000L): (Int, Int) = synchronized {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val vs = versions
    vacuumDropping(vs.dropRight(keepLast).toSet, minOrphanAgeMs)
  }

  /** Pin-aware vacuum: keeps `pinned` versions (the ones catalog history
    * still references — [[SnapshotCatalog.retainedVersions]] feeds this
    * directly) PLUS the current version, drops everything else. The
    * catalog/table vacuum handshake: expire catalog history first, then
    * vacuum each member with its retained set.
    */
  def vacuumKeeping(pinned: Set[Long],
      minOrphanAgeMs: Long = 3600000L): (Int, Int) = synchronized {
    val vs = versions
    val keep = pinned ++ currentVersion
    val missing = pinned.diff(vs.toSet)
    require(missing.isEmpty,
      s"cannot pin absent versions ${missing.toSeq.sorted.mkString(",")} at $dir")
    vacuumDropping(vs.toSet.diff(keep), minOrphanAgeMs)
  }

  private def vacuumDropping(dropSet: Set[Long], minOrphanAgeMs: Long): (Int, Int) = {
    val vs = versions
    val nowForFloor = System.currentTimeMillis()
    // MANIFEST AGE FLOOR (same window as the data-root orphan guard): a
    // version younger than `minOrphanAgeMs` is never dropped even when the
    // caller's keep-set excludes it — it may be a concurrent writer's
    // commit, pinned by a catalog cut published AFTER the caller listed
    // pins (the vacuumAll expire → per-table TOCTOU seam). The hour that
    // protects in-flight data roots protects fresh history for the same
    // reason; a version missing from the re-listing is likewise left alone.
    val manifestAge: Map[Long, Long] = Dfs.list(manifestsDir)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("v") && n.endsWith(".manifest"))
          Some(n.stripPrefix("v").stripSuffix(".manifest").toLong ->
            st.getModificationTime)
        else None
      }.toMap
    val drop = vs.filter(dropSet).filter(v =>
      manifestAge.get(v).exists(m => nowForFloor - m >= minOrphanAgeMs))
    // the floor intervening is a DIFFERENT outcome than "nothing to drop"
    // (an explicit vacuum(keepLast=1) on a young table reclaims nothing
    // and should say why) — recorded for callers/SQL faces to surface
    lastVacuumWithheld = vs.count(dropSet) - drop.size
    val keep = vs.filterNot(drop.toSet)
    val referencedRoots = keep.flatMap(v => readManifest(v).values)
      .map(rel => rel.substring(0, rel.indexOf("/__bucket="))).toSet
    val dataDir = new HPath(dir, "data")
    val now = System.currentTimeMillis()
    val orphans = Dfs.list(dataDir)
      .filterNot(st => referencedRoots.contains(s"data/${st.getPath.getName}"))
      .filter(st => now - st.getModificationTime >= minOrphanAgeMs)
    orphans.foreach(st => deleteTree(st.getPath))
    // strict: the RETURN VALUE reports these as expired
    drop.foreach { v =>
      Dfs.deleteStrict(manifestPath(v))
      SnapshotParquetSink.evictManifest(dir, v)
    }
    // aged-out temp manifests from crashed commits (lost races clean their
    // own temp synchronously; a crash between write and publish does not)
    Dfs.list(manifestsDir)
      .filter(st => st.getPath.getName.startsWith(".tmp-"))
      .filter(st => now - st.getModificationTime >= minOrphanAgeMs)
      .foreach(st => Dfs.delete(st.getPath))
    (drop.size, orphans.size)
  }

  private def deleteTree(p: HPath): Unit = Dfs.deleteTreeStrict(p)
}
