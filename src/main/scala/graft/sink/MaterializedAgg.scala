package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a snapshot table —
  * the "never recompute the world" leg of the table-format family: a
  * downstream GROUP BY is kept in its own [[SnapshotParquetSink]] and
  * advanced per source version by DIRTY-GROUP RECOMPUTE, the
  * incremental-view-maintenance strategy that stays EXACT for arbitrary
  * aggregates. Delta-based maintenance (add inserts, subtract deletes) is
  * cheaper but silently wrong for non-additive aggregates — deleting a
  * group's current `max` row leaves a delta maintainer with a value no
  * arithmetic can roll back. Recomputing only the groups the change feed
  * touched costs O(changed groups' rows), not O(table), and is exact for
  * `min`/`max`/`count_distinct`/anything Spark can express.
  *
  * Per [[refresh]]:
  *   1. a key-level full outer join of the live states at the last applied
  *      version and the current version names the dirty GROUPS in one
  *      column-pruned pass (same change semantics as
  *      [[SnapshotParquetSink.changesBetween]]: presence diff + null-safe
  *      seq inequality; BOTH sides' group values count, because an update
  *      can MOVE a row between groups — the old group must shrink and the
  *      new one grow);
  *   2. dirty groups recompute from the source's current snapshot and
  *      MERGE into the aggregate table (affected buckets only); groups
  *      with no remaining rows merge as logical deletes.
  *
  * The applied-version bookkeeping is the aggregate table's own manifest:
  * every refreshed row carries `seq` = the source version it was computed
  * at, so the agg manifest's `maxseq` IS the applied version — recorded
  * atomically with the data by the same commit, which makes a crashed or
  * replayed refresh self-healing: it recomputes the same dirty groups and
  * merges identical content under the same seq (last-write-wins keeps the
  * state; a replay after the commit is a metadata no-op).
  *
  * Retention contract: [[refresh]] reads the source AT the last applied
  * version, so the source must retain every version back to it — vacuum
  * the source with `keepLast` covering the refresh cadence (the
  * [[SnapshotCatalog.retainedVersions]] handshake shape).
  *
  * Scale shape at 100 TB: the change feed and dirty-key semi-joins
  * shuffle on the source merge key (the same join any consumer diff
  * pays); the recompute scan reads only group/agg columns and — under a
  * group-correlated layout (`clusterBy` on the group columns, or manifest
  * stats that happen to correlate) — only the buckets holding dirty
  * groups. The merge rewrites only the agg buckets the dirty groups hash
  * to. Nothing is proportional to table size except the one column-pruned
  * recompute scan, and nothing is ever proportional to history length.
  */
/** A view maintained by incremental refresh — what a transactional pipeline
  * ([[graft.streaming.CatalogTxnStream]]) needs to advance views inside a
  * cut without knowing their shape: [[MaterializedAgg]] (one source) and
  * [[MaterializedJoin]] (two) both qualify; cascaded views stack by
  * declaring them in bottom-up order.
  */
trait MaintainedView {
  def sink: SnapshotParquetSink

  /** Refresh when every source has a committed version; no-op before the
    * first source data arrives.
    */
  def refreshIfReady(spark: SparkSession): Unit
}

final class MaterializedAgg(
    val source: SnapshotParquetSink,
    val sink: SnapshotParquetSink,
    val groupCols: Seq[String],
    val aggs: Seq[Column],
    seqCol: String = "seq") extends MaintainedView {

  override def refreshIfReady(spark: SparkSession): Unit =
    if (source.currentVersion.nonEmpty) {
      refresh(spark)
      ()
    }

  require(groupCols.nonEmpty, "materialized aggregate needs group columns")
  require(aggs.nonEmpty, "materialized aggregate needs aggregate columns")

  /** The source version the aggregate table currently reflects — the agg
    * manifest's recorded max seq (every refresh stamps its rows with the
    * source version, so this never needs a data read).
    */
  def appliedVersion: Option[Long] =
    sink.currentVersion.flatMap(v =>
      SnapshotParquetSink.manifestMaxSeq(sink.dir, v))

  private def grouped(rows: DataFrame): DataFrame = {
    val g = rows.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    require(g.columns.toSeq.distinct.size == g.columns.length,
      s"aggregate names collide with group columns: ${g.columns.toSeq}")
    val names = g.columns.toSeq.filterNot(groupCols.contains)
    // unaliased aggregates get generated names like `sum(v)` — illegal in
    // parquet field names and useless downstream; demand explicit aliases
    names.foreach(n => require(n.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"aggregate columns must be aliased (.as(...)): got '$n'"))
    val reserved = Set("seq", "__del", "__present")
    require(names.forall(n => !reserved(n)),
      s"aggregate names $names collide with bookkeeping columns $reserved")
    g
  }

  private def aggNamesOf(g: DataFrame): Seq[String] =
    g.columns.toSeq.filterNot(groupCols.contains)

  // null-safe group equality: group columns may legitimately hold nulls
  // (groupBy keeps a null group; a plain equi-join would drop it)
  private def groupCond(left: DataFrame, right: DataFrame) =
    groupCols.map(k => left(k) <=> right(k)).reduce(_ && _)

  /** Advances the aggregate table to the source's current version.
    * Returns Some(appliedSourceVersion) when a refresh ran, None when
    * already current. A first call on an empty aggregate table builds it
    * fully from the source's current snapshot.
    */
  def refresh(spark: SparkSession): Option[Long] = synchronized {
    val srcV = source.currentVersion.getOrElse(
      sys.error(s"source table at ${source.dir} has no committed version"))
    appliedVersion match {
      case Some(applied) if applied >= srcV => None
      case None =>
        // initial build: the whole current snapshot, one grouped pass.
        // Persisted because merge evaluates its input several times
        // (affected buckets, max seq, write) — O(groups) rows, spillable.
        val full = grouped(source.readAt(spark, srcV, DeleteMode.Hard))
          .withColumn("seq", lit(srcV))
          .withColumn("__del", lit(false))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          sink.merge(full, groupCols, "seq", "__del")
          Some(srcV)
        } finally {
          full.unpersist()
          ()
        }
      case Some(applied) =>
        val srcKeys = SnapshotParquetSink.manifestKeys(source.dir, srcV)
        // self-healing when the diff base is GONE (the view lagged past the
        // source's vacuum retention): every group on either side — current
        // view, current snapshot — is dirty, and the normal recompute +
        // outer-join machinery below rebuilds live groups and tombstones
        // vanished ones. Costs one full pass; the fix for recurrence is
        // retention covering the refresh cadence (class scaladoc).
        val baseRetained = source.versions.contains(applied)
        // dirty groups = groups of the changed keys' rows at EITHER version
        // (an update can move a row between groups; a delete's group is
        // only visible on the from side). ONE plan — a key-level full outer
        // join of the two live states carrying both sides' group columns —
        // instead of running the change feed and then re-reading both
        // versions to recover groups (same change semantics as
        // [[SnapshotParquetSink.changesBetween]]: presence diff + null-safe
        // seq inequality; a carried row's value cannot change without its
        // seq changing, the stored last-write seq stands in for value
        // comparison)
        val probeCols = (srcKeys ++ groupCols :+ seqCol).distinct
        // each side reads only the buckets whose file differs between the
        // two manifests — shared files are byte-identical and keys route
        // to the same bucket, so untouched buckets cannot contribute dirt.
        // Changed files predating an evolution-added probe column fall
        // back to the full read — on BOTH sides together (a full side
        // joined against a pruned side would misread every unchanged key
        // as a presence diff); the footer check is changed-files-only.
        def diffDirty(): DataFrame = {
          val partA = source.readChangedAt(spark, applied, srcV, DeleteMode.Hard)
          val partB = source.readChangedAt(spark, srcV, applied, DeleteMode.Hard)
          val pruned = (partA.toSeq ++ partB.toSeq)
            .forall(p => probeCols.forall(p.columns.contains))
          def side(part: Option[DataFrame], v: Long, marker: String): DataFrame = {
            val rows =
              if (pruned)
                part.getOrElse(source.readAt(spark, v, DeleteMode.Hard).filter(lit(false)))
              else source.readAt(spark, v, DeleteMode.Hard)
            rows.select(probeCols.map(col): _*).withColumn(marker, lit(true))
          }
          val a = side(partA, applied, "__pa").alias("a")
          val b = side(partB, srcV, "__pb").alias("b")
          val keyCond = srcKeys.map(k => col(s"a.$k") <=> col(s"b.$k")).reduce(_ && _)
          val changed = a.join(b, keyCond, "full_outer")
            .filter(col("a.__pa").isNull || col("b.__pb").isNull ||
              !(col(s"a.$seqCol") <=> col(s"b.$seqCol")))
          def groupsIfPresent(tag: String, marker: String) =
            when(col(marker).isNotNull,
              struct(groupCols.map(n => col(s"$tag.$n").as(n)): _*))
          changed
            .select(explode(array(groupsIfPresent("a", "a.__pa"),
              groupsIfPresent("b", "b.__pb"))).as("g"))
            .filter(col("g").isNotNull)
            .select(groupCols.map(n => col(s"g.$n").as(n)): _*).distinct()
        }
        def rebuildDirty(): DataFrame =
          read(spark).select(groupCols.map(col): _*)
            .unionByName(source.readAt(spark, srcV, DeleteMode.Hard)
              .select(groupCols.map(col): _*))
            .distinct()
        val dirty = (if (baseRetained) diffDirty() else rebuildDirty())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // KEYED VIEWS (groupCols ⊇ merge keys — per-key rollups): a dirty
          // group's rows all share its key, the key routes to one bucket,
          // and that bucket's file changed with the key — so the recompute
          // scan itself reads only CHANGED buckets and the whole refresh is
          // O(changed), never O(table). Cross-key rollups must scan the
          // snapshot (exact min/max needs every surviving row of a dirty
          // group, and those live anywhere). Evolution corner (an agg
          // column the changed files predate) falls back to the full scan.
          val keyDetermined = baseRetained && srcKeys.forall(groupCols.contains)
          def fullSnap = source.readAt(spark, srcV, DeleteMode.Hard)
          val snap =
            if (keyDetermined)
              source.readChangedAt(spark, srcV, applied, DeleteMode.Hard)
                .getOrElse(fullSnap.filter(lit(false)))
            else fullSnap
          val touched = snap.join(dirty, groupCond(snap, dirty), "left_semi")
          val recomputed =
            try grouped(touched)
            catch {
              case _: org.apache.spark.sql.AnalysisException if keyDetermined =>
                val t = fullSnap.join(dirty, groupCond(fullSnap, dirty), "left_semi")
                grouped(t)
            }
          val names = aggNamesOf(recomputed)
          // one outer join covers both cases: dirty groups that still have
          // rows get their recomputed aggregates; groups with no remaining
          // rows (marker null) merge as logical deletes so history stays
          // time-travelable. Seq-only churn (dirty empty) flows through as
          // an empty delta — merge's affected-buckets check no-ops it.
          val marked = recomputed.withColumn("__present", lit(true))
          val delta = dirty
            .join(marked, groupCond(dirty, marked), "left_outer")
            .select(groupCols.map(dirty(_)) ++ names.map(marked(_)) :+
              marked("__present").isNull.as("__del"): _*)
            .withColumn("seq", lit(srcV))
            // merge walks this several times; without the persist every walk
            // re-runs the whole recompute join pipeline — O(dirty groups)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            sink.merge(delta, groupCols, "seq", "__del")
            Some(srcV)
          } finally {
            delta.unpersist()
            ()
          }
        } finally {
          dirty.unpersist()
          ()
        }
    }
  }

  /** The aggregate-table version that reflects exactly `sourceVersion` —
    * the newest agg version whose recorded maxseq equals it (every refresh
    * stamps its rows with the source version it computed from, so the agg
    * manifest's maxseq IS the applied source version). None when that
    * source version was never refreshed into the view, was vacuumed out of
    * the agg history, or the matching refresh was a dirty-group no-op
    * (seq-only churn advances no manifest — semantically current, but this
    * method cannot prove it cheaply, so callers treat it as stale).
    */
  def versionFor(sourceVersion: Long): Option[Long] =
    sink.versions.reverse.find(v =>
      SnapshotParquetSink.manifestMaxSeq(sink.dir, v).contains(sourceVersion))

  /** The maintained aggregate — live groups only. */
  def read(spark: SparkSession): DataFrame =
    sink.read(spark, DeleteMode.Hard)
}

/** Registry for automatic query rewrite ([[graft.plans.MatViewRewrite]]):
  * a registered view makes any session with [[graft.GraftExtensions]]
  * installed answer a matching `GROUP BY` over the SOURCE table from the
  * maintained aggregate instead — when, and only when, the view has been
  * refreshed to the exact source version the query would scan. Process-wide
  * (the optimizer rule object is too); keys are source-table dirs, so two
  * views over one source cannot both be registered — last registration
  * wins, mirroring how a warehouse resolves one matview per rewrite slot.
  */
object MaterializedAgg {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MaterializedAgg]()

  /** Scheme-insensitive dir key ("file:/x" and "/x" are the same table on
    * the test fs; on a real cluster both sides of a lookup come from the
    * same FileSystem so stripping the scheme cannot collide).
    */
  private[graft] def normDir(dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    (if (p == null || p.isEmpty) dir else p).stripSuffix("/")
  }

  def register(m: MaterializedAgg): Unit = {
    registry.put(normDir(m.source.dir), m)
    ()
  }

  def unregister(m: MaterializedAgg): Unit = {
    registry.remove(normDir(m.source.dir), m)
    ()
  }

  def registered(sourceDir: String): Option[MaterializedAgg] =
    Option(registry.get(normDir(sourceDir)))

  private[graft] def registeredViews: Seq[MaterializedAgg] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.toSeq
  }

  private[graft] def anyRegistered: Boolean = !registry.isEmpty
}
