package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sink.SnapshotParquetSink

/** DataSourceV2 read path for [[graft.sink.SnapshotParquetSink]] tables —
  * the manifest-committed format becomes reachable from plain SQL:
  *
  * {{{
  *   spark.read.format("graft-snapshot")
  *     .option("asOf", 3)            // optional time travel (default: latest)
  *     .option("keys", "id")         // optional: enables bucket pruning
  *     .load("/path/to/sink")
  * }}}
  *
  * Semantics: the COMMITTED state at the resolved version, exposed with the
  * logical-delete flag `__is_deleted` visible (the SQL twin of
  * `DeleteMode.Logical`; hard-delete consumers filter `NOT __is_deleted`).
  * Internal bookkeeping columns (`__gen`, the bucket directory) stay hidden.
  *
  * Scale shape: when `keys` is declared and a query pins EVERY key with an
  * equality predicate, the scan builder routes the literals through the
  * write path's driver-side bucket hash ([[SnapshotParquetSink.bucketFor]])
  * and plans ONLY that bucket's file — a key probe reads 1/nBuckets of the
  * table before parquet row-group pruning even starts. All remaining
  * filtering/pushdown delegates to Spark's own DSv2 parquet scan, so
  * vectorized reads, nested-column pruning and predicate pushdown behave
  * exactly as for any parquet table.
  */
class SnapshotTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SnapshotState.resolve(options).dataSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SnapshotTable(SnapshotState.resolve(new CaseInsensitiveStringMap(properties)), schema)
}

/** One resolved (dir, version) view of a snapshot table. */
private[sources] final case class SnapshotState(dir: String, version: Long,
    nBuckets: Int, entries: Map[Int, String], keys: Seq[String]) {

  def bucketPaths: Seq[String] = entries.toSeq.sortBy(_._1).map { case (_, rel) => s"$dir/$rel" }

  /** Merged-across-commits schema minus internal bookkeeping. */
  lazy val dataSchema: StructType = {
    val spark = SparkSession.active
    val full = spark.read.option("mergeSchema", "true").parquet(bucketPaths: _*).schema
    StructType(full.fields.filterNot(_.name == "__gen"))
  }

  /** The file list a scan must read given the pushed filters: one bucket
    * when every declared key is pinned by an equality, all buckets else.
    */
  def prunedPaths(filters: Seq[Expression]): Seq[String] = {
    if (keys.isEmpty) return bucketPaths
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Literal}
    val eqs = filters.collect {
      case EqualTo(a: Attribute, l: Literal) =>
        a.name -> CatalystTypeConverters.convertToScala(l.value, l.dataType)
      case EqualTo(l: Literal, a: Attribute) =>
        a.name -> CatalystTypeConverters.convertToScala(l.value, l.dataType)
    }.toMap
    if (!keys.forall(eqs.contains)) return bucketPaths
    val bucket = SnapshotParquetSink.bucketFor(
      keys.map(eqs), keys.map(k => dataSchema(k).dataType), nBuckets)
    entries.get(bucket).map(rel => Seq(s"$dir/$rel")).getOrElse(Seq.empty)
  }
}

private[sources] object SnapshotState {
  def resolve(options: CaseInsensitiveStringMap): SnapshotState = {
    val dir = Option(options.get("path"))
      .getOrElse(sys.error("graft-snapshot needs a path: .load(dir) or option(\"path\", dir)"))
    val versions = SnapshotParquetSink.versions(dir)
    require(versions.nonEmpty, s"no snapshot published at $dir")
    val version = Option(options.get("asOf")).map(_.toLong).getOrElse(versions.last)
    require(versions.contains(version),
      s"snapshot v$version does not exist at $dir (vacuumed or never published); " +
        s"available: ${versions.mkString(", ")}")
    val (nBuckets, entries) = SnapshotParquetSink.manifest(dir, version)
    val keys = Option(options.get("keys")).map(_.split(',').toSeq.map(_.trim)).getOrElse(Seq.empty)
    SnapshotState(dir, version, nBuckets, entries, keys)
  }
}

private[sources] final class SnapshotTable(state: SnapshotState, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-snapshot `${state.dir}` v${state.version}"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotScanBuilder(state, schema0)
}

/** Collects pushed catalyst filters (all returned as residual — Spark
  * re-evaluates every predicate above the scan, so bucket pruning can be a
  * pure file-list optimization with zero correctness exposure), prunes the
  * bucket list, then hands the actual scan to Spark's DSv2 parquet stack.
  */
private[sources] final class SnapshotScanBuilder(state: SnapshotState, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushedExprs: Seq[Expression] = Seq.empty

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedExprs = filters
    filters // everything stays residual; the delegate re-pushes for parquet
  }

  // the delegate parquet scan advertises its own pushdown in explain; this
  // builder claims none so no predicate is ever marked handled twice
  override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    ()
  }

  override def build(): Scan = {
    val spark = SparkSession.active
    val paths = state.prunedPaths(pushedExprs)
    val opts = new CaseInsensitiveStringMap(Map("mergeSchema" -> "true").asJava)
    val delegate = ParquetTable(s"graft-snapshot-v${state.version}", spark, opts,
      paths.toList, Some(fullSchema), classOf[ParquetFileFormat])
    val psb = delegate.newScanBuilder(opts)
    psb.pushFilters(pushedExprs)
    psb.pruneColumns(required)
    psb.build()
  }
}
