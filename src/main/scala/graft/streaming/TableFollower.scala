package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{CommitLock, Dfs}
import graft.sink.{DeleteMode, SnapshotParquetSink}

/** Incremental TABLE-TO-TABLE pipeline: follow an upstream snapshot table's
  * commit log and keep a downstream snapshot table equal to
  * `transform(upstream state)` — the bronze→silver chaining a multi-hop
  * deployment needs without a message bus between hops (the Delta
  * streaming-source idea expressed over the manifest log). Each [[catchUp]]
  * reads only the buckets whose FILES changed since the last applied
  * upstream version ([[SnapshotParquetSink.readChangedAt]]), applies the
  * transform, and merges — cost O(changed fraction), never O(table).
  *
  * Exactly-once by idempotence (the CdcStream contract): the downstream
  * merge is last-write-wins keyed replay, so re-applying a slice after a
  * crash between merge and checkpoint converges bit-identically; the
  * applied-version checkpoint is a monotone set of marker files published
  * through the commit-lock seam.
  *
  * Transform contract: ROW-WISE on the value columns — it must pass the
  * merge keys, `seqCol` and the logical-delete flag `is_deleted` through
  * unchanged, and must not drop rows (to filter, set `is_deleted` instead:
  * a dropped row would leave the downstream copy stale forever, while a
  * tombstoned one deletes it). Aggregations/joins belong to
  * [[graft.sink.MaterializedAgg]]/[[graft.sink.MaterializedJoin]] — this
  * operator is the per-row enrichment hop.
  *
  * Retention handshake: if the upstream vacuumed past the last applied
  * version, [[catchUp]] SELF-HEALS with one full-state resync (upstream
  * tombstones are rows, so deletes still forward) — but an upstream
  * `purgeTombstones` horizon must not outrun lagging followers, exactly
  * like it must not outrun its own seq-replay horizon.
  */
final class TableFollower(upstreamDir: String,
    downstream: SnapshotParquetSink, name: String) {

  require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
    s"follower name '$name' must be [A-Za-z0-9_-]+ (it becomes a directory name)")

  private def markerDir: HPath =
    new HPath(downstream.dir, s"_follower/$name")

  /** The highest upstream version this follower has fully applied. */
  def appliedVersion: Option[Long] = {
    Dfs.list(markerDir).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".applied") =>
        s.stripPrefix("v").stripSuffix(".applied").toLong }
      .maxOption
  }

  private def publishMarker(v: Long): Unit = {
    Dfs.mkdirs(markerDir)
    val tmp = new HPath(markerDir, s".tmp-v$v")
    Dfs.writeUtf8(tmp, s"applied=$v\n")
    // losing means another follower instance applied the same version —
    // the merge below it was idempotent replay, nothing to repair
    if (!CommitLock.current.publishOntoAbsent(tmp,
        new HPath(markerDir, f"v$v%08d.applied")))
      Dfs.delete(tmp)
    // keep the checkpoint bounded: only the max matters
    Dfs.list(markerDir)
      .filter(st => st.getPath.getName.startsWith("v") &&
        st.getPath.getName.endsWith(".applied"))
      .map(st => st.getPath)
      .sortBy(_.getName).dropRight(2)
      .foreach(p => Dfs.delete(p))
  }

  /** Apply everything committed upstream since the last catch-up: ONE
    * downstream merge over the changed slice (or the full state on first
    * run / vacuum self-heal), then advance the checkpoint. Returns the
    * newly applied upstream version, or None when already current.
    */
  def catchUp(spark: SparkSession, keys: Seq[String], seqCol: String = "seq")(
      transform: DataFrame => DataFrame): Option[Long] = synchronized {
    val upstream = SnapshotParquetSink.forTable(upstreamDir)
    val latest = upstream.currentVersion.getOrElse(
      sys.error(s"no committed version at $upstreamDir to follow"))
    val applied = appliedVersion
    if (applied.contains(latest)) return None
    TableFollower.sliceFor(spark, upstream, name, applied, latest)
      .foreach(df => applySlice(df, keys, seqCol, transform))
    publishMarker(latest)
    Some(latest)
  }

  private[streaming] def applySlice(df: DataFrame, keys: Seq[String],
      seqCol: String, transform: DataFrame => DataFrame): Unit = {
    val out = transform(df)
    keys.foreach(k => require(out.columns.contains(k),
      s"transform dropped merge key '$k' — keys must pass through"))
    require(out.columns.contains(seqCol),
      s"transform dropped seq column '$seqCol' — it must pass through")
    require(out.columns.contains("is_deleted"),
      "transform dropped 'is_deleted' — tombstones must pass through " +
        "(filter by SETTING it, not by dropping rows)")
    downstream.merge(out, keys, seqCol, "is_deleted")
  }

  private[streaming] def markerFor(v: Long): Unit = publishMarker(v)
}

object TableFollower {

  /** One downstream hop of a [[fanOut]]: its own table, checkpoint name,
    * merge keys and row-wise transform (the [[TableFollower]] contract).
    */
  final case class Hop(downstream: SnapshotParquetSink, name: String,
      keys: Seq[String], transform: DataFrame => DataFrame,
      seqCol: String = "seq")

  /** The slice a follower at `applied` must merge to reach `latest`:
    * changed buckets only on the incremental path, the full state on first
    * run / vacuum self-heal / evolution lag, None when the manifests share
    * every file (advance the marker, nothing to merge).
    */
  private[streaming] def sliceFor(spark: SparkSession,
      upstream: SnapshotParquetSink, name: String,
      applied: Option[Long], latest: Long): Option[DataFrame] = {
    applied.foreach(a => require(a <= latest,
      s"follower '$name' applied v$a but upstream head is v$latest — the " +
        "upstream table was rebuilt under the same path; delete the " +
        "follower checkpoint to restart from scratch"))
    val retained = upstream.versions.toSet
    applied match {
      case Some(prev) if retained.contains(prev) =>
        upstream.readChangedAt(spark, latest, prev, DeleteMode.Logical) match {
          case None => None // manifests share every file — nothing to apply
          case Some(changed) =>
            // evolution fallback: changed files may predate a column the
            // transform needs — when their merged schema lags the table's,
            // fall back to the full state (correct, just unpruned). The
            // table's column set comes from the manifest's recorded schema
            // when present (metadata-only); a full readAt is the legacy path
            val fullCols: Set[String] =
              SnapshotParquetSink.manifestSchema(upstream.dir, latest)
                .map(_.fieldNames.toSet - "__gen" - "__is_deleted" + "is_deleted")
                .getOrElse(
                  upstream.readAt(spark, latest, DeleteMode.Logical).columns.toSet)
            if (changed.columns.toSet == fullCols) Some(changed)
            else Some(upstream.readAt(spark, latest, DeleteMode.Logical))
        }
      case Some(_) => // diff base vacuumed: one full resync, then incremental
        Some(upstream.readAt(spark, latest, DeleteMode.Logical))
      case None => // first run: full initial load
        Some(upstream.readAt(spark, latest, DeleteMode.Logical))
    }
  }

  /** FAN-OUT catch-up: one upstream serving N downstream hops — the
    * one-bronze-many-silvers shape. Hops standing at the SAME applied
    * version share ONE slice, computed once and persisted across their
    * transforms and merges (N hops pay one upstream read instead of N);
    * hops at different versions (a newly added hop's initial full load, a
    * straggler's self-heal) group separately and get the slice their
    * position requires. Each hop checkpoints independently, so a crash
    * between two hops' merges replays idempotently per hop — exactly the
    * single-hop contract, N times. Returns hop name → newly applied
    * version (None = that hop was already current).
    */
  def fanOut(spark: SparkSession, upstreamDir: String,
      hops: Seq[Hop]): Map[String, Option[Long]] = {
    require(hops.nonEmpty, "fanOut needs at least one hop")
    require(hops.map(_.name).distinct.size == hops.size,
      "fanOut hop names must be distinct (each is a checkpoint identity)")
    val upstream = SnapshotParquetSink.forTable(upstreamDir)
    val latest = upstream.currentVersion.getOrElse(
      sys.error(s"no committed version at $upstreamDir to follow"))
    val withFollowers = hops.map(h =>
      (h, new TableFollower(upstreamDir, h.downstream, h.name)))
    val results = scala.collection.mutable.Map.empty[String, Option[Long]]
    withFollowers.groupBy { case (_, f) => f.appliedVersion }.foreach {
      case (applied, group) =>
        if (applied.contains(latest)) {
          group.foreach { case (h, _) => results(h.name) = None }
        } else {
          val slice = sliceFor(spark, upstream,
            group.map(_._1.name).mkString("+"), applied, latest)
          slice match {
            case None =>
              group.foreach { case (h, f) =>
                f.markerFor(latest); results(h.name) = Some(latest) }
            case Some(df0) =>
              val df = df0.persist(
                org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              try group.foreach { case (h, f) =>
                f.applySlice(df, h.keys, h.seqCol, h.transform)
                f.markerFor(latest)
                results(h.name) = Some(latest)
              } finally {
                df.unpersist()
                ()
              }
          }
        }
    }
    results.toMap
  }
}
