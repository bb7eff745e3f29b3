package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.TableSpec
import graft.types.UdtMapper

/** Batch building blocks of the per-table CDC pipeline (R2–R15):
  * multiplexed envelope → derived `full_table_name` → per-table filter →
  * star-expansion → typed cast → last-write-wins upsert view.
  *
  * Scale notes: every step is a narrow projection/filter until [[latest]],
  * which shuffles once on the primary key — the minimal shuffle any
  * upsert-by-key semantics needs. The per-table filter is a pushed-down
  * predicate on the source (the reference installs it at the source too,
  * add_output.py:366-406).
  */
object CdcPipeline {

  /** Reads a batch of CDC envelope documents (JSONL). Schema is inferred —
    * the reference similarly infers from data (SURVEY §1.1) — with the
    * inference result cached per observed file state: un-schema'd
    * `read.json` runs a full parse job at CONSTRUCTION time, which
    * re-readers of an immutable input paid once per build
    * ([[graft.engine.JsonSchemaCache]]).
    */
  def readBatch(spark: SparkSession, path: String): DataFrame =
    graft.engine.JsonSchemaCache.read(spark, path)

  /** R3 calculated field (README.md:29-32): strip the `_part_N` shard suffix
    * and qualify with the database name.
    */
  def fullTableName(database: Column, table: Column): Column =
    concat(database, lit("."), regexp_replace(table, "_part_[0-9]+$", ""))

  def withFullTableName(df: DataFrame): DataFrame =
    df.withColumn("full_table_name",
      fullTableName(col("data.database_name"), col("data.table_name")))

  /** R5 per-table equality filter, with the reference's `inverted` switch
    * (add_output.py:394).
    */
  def forTable(df: DataFrame, table: String, inverted: Boolean = false): DataFrame = {
    val d = if (df.columns.contains("full_table_name")) df else withFullTableName(df)
    val p = d.col("full_table_name") === lit(table)
    d.filter(if (inverted) !p else p)
  }

  /** R26 include/exclude set filters (add_output.py:512-516,546-549). */
  def includeExclude(df: DataFrame, include: Seq[String], exclude: Seq[String]): DataFrame = {
    val d = if (df.columns.contains("full_table_name")) df else withFullTableName(df)
    val inc = if (include.nonEmpty) d.filter(col("full_table_name").isin(include: _*)) else d
    if (exclude.nonEmpty) inc.filter(!col("full_table_name").isin(exclude: _*)) else inc
  }

  /** R4/R6/R12: project the envelope into the flat warehouse shape —
    * `primary_key`, `is_delete`, `seq`, plus `row_*`/`old_row_*` leaves.
    */
  def expanded(df: DataFrame): DataFrame = {
    val dataSchema = df.schema("data").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    // insert-only feeds may carry neither metadata nor old_row structs
    val isDelete =
      if (dataSchema.fieldNames.contains("metadata"))
        coalesce(col("data.metadata.is_delete"), lit(false))
      else lit(false)
    val base = Seq(
      col("seq"),
      col("data.primary_key").as("primary_key"),
      isDelete.as("is_delete"))
    val rows = Flatten.columns(df, "data.row", "row_")
    // insert-only streams may carry no old_row struct at all
    val olds =
      if (dataSchema.fieldNames.contains("old_row")) Flatten.columns(df, "data.old_row", "old_row_")
      else Nil
    df.select(base ++ rows ++ olds: _*)
  }

  /** R11 upsert semantics as a batch view: last event per key by `seq`.
    * One hash shuffle on the key; ties broken by `seq` (strictly increasing
    * per FIXTURES.md, which makes the result order-insensitive and
    * streaming-restart-safe, SURVEY §7.4).
    */
  def latest(df: DataFrame, keys: Seq[String], seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** R14 hard delete: after last-write-wins, drop keys whose final event is
    * a delete.
    */
  def hardDelete(latestDf: DataFrame, isDeleteCol: String = "is_delete"): DataFrame =
    latestDf.filter(!coalesce(col(isDeleteCol), lit(false)))

  /** R15 logical delete: keep all keys, expose a boolean `is_deleted`. */
  def logicalDelete(latestDf: DataFrame, isDeleteCol: String = "is_delete"): DataFrame =
    latestDf.withColumn("is_deleted", coalesce(col(isDeleteCol), lit(false)))

  /** R8/R10: cast the string-typed `row_*` columns through the udt matrix.
    * Arrays (DbVariant) stay typed `ArrayType` internally by default —
    * `to_json` only at the sink boundary (SURVEY §1.3). With
    * `variantArrays`, DbVariant columns become Spark-4 `VariantType`
    * instead: values carry their own type tags, so heterogeneous or
    * evolving element types survive without a frozen array element type
    * (`variant_get` extracts, `to_json` serializes — same sink boundary).
    */
  def typed(df: DataFrame, spec: TableSpec, prefix: String = "row_",
      variantArrays: Boolean = false): DataFrame = {
    val casts = spec.cols.filter(c => df.columns.contains(prefix + c.name)).map { c =>
      val src = col(prefix + c.name)
      val m = c.mapped
      val out =
        if (m.isArray && variantArrays)
          parse_json(to_json(transform(src, x => x.cast(m.sparkType))))
        else if (m.isArray) transform(src, x => x.cast(m.sparkType))
        else src.cast(m.sparkType)
      out.as(prefix + c.name)
    }
    val keep = Seq("seq", "primary_key", "is_delete", "is_deleted")
      .filter(df.columns.contains).map(col)
    df.select(keep ++ casts: _*)
  }

  /** Whole per-table batch pipeline: filter → expand → cast → upsert view →
    * delete mode. This is the reference's entire data-plane essence
    * (SURVEY §7.3).
    */
  def materialize(
      envelope: DataFrame,
      spec: TableSpec,
      logicalDeletes: Boolean = false): DataFrame = {
    val flat = expanded(forTable(envelope, spec.fullTableName))
    val last = latest(typed(flat, spec), Seq("primary_key"))
    if (logicalDeletes) logicalDelete(last) else hardDelete(last)
  }

  /** Time travel: the table state as of `maxSeq` — replay the log up to the
    * cutoff, then the normal upsert view. With an event log retained (as
    * the CDC sink's tombstone design already does), any historical state is
    * one filtered pass away; the seq predicate pushes into the source scan.
    */
  def stateAsOf(
      envelope: DataFrame,
      spec: TableSpec,
      maxSeq: Long,
      seqCol: String = "seq",
      logicalDeletes: Boolean = false): DataFrame =
    materialize(envelope.filter(col(seqCol) <= maxSeq), spec, logicalDeletes)

  /** SCD Type 2: one validity-interval row per non-delete event —
    * `valid_from_seq` = the event's seq, `valid_to_seq` = the next event's
    * seq on the same key (null = still current; a delete event closes the
    * last version without opening one). The window partitions by key, so
    * the computation distributes like any keyed window.
    */
  def scd2(flat: DataFrame, keys: Seq[String], seqCol: String = "seq",
      isDeleteCol: String = "is_delete"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol))
    flat
      .withColumn("valid_to_seq", lead(col(seqCol), 1).over(w))
      .filter(!coalesce(col(isDeleteCol), lit(false)))
      .withColumn("is_current", col("valid_to_seq").isNull)
      .withColumnRenamed(seqCol, "valid_from_seq")
  }

  /** Per-table applied head: the highest `seq` present per table in a
    * (retained) envelope log — the input to [[consistentCutoff]] when the
    * heads aren't tracked externally. One grouped max, map-side combinable.
    */
  def appliedHeads(envelope: DataFrame, seqCol: String = "seq"): DataFrame = {
    val d = if (envelope.columns.contains("full_table_name")) envelope
            else withFullTableName(envelope)
    d.groupBy(col("full_table_name")).agg(max(col(seqCol)).as("head_seq"))
  }

  /** The highest cutoff at which EVERY listed replica is complete: the min
    * of the per-table applied heads. Reading all tables AS OF this seq is
    * the consistent cut across independently-replicating per-table streams
    * — each table has applied every event ≤ the cutoff, so no table shows
    * state the others haven't caught up to (the skew that manufactures
    * false FK orphans between a fast child stream and a lagging parent).
    */
  def consistentCutoff(appliedHeads: Map[String, Long]): Long = {
    require(appliedHeads.nonEmpty, "consistentCutoff needs at least one table head")
    appliedHeads.values.min
  }

  /** Cross-table consistent read: every table's state replayed from the
    * retained log to the SAME global `maxSeq` cutoff — the multi-table
    * snapshot a consumer of a per-table CDC replica set actually wants
    * (independent last-write-wins streams are never transactionally
    * consistent across tables at their own heads). Each table is one
    * [[stateAsOf]] pass: the seq predicate pushes into the shared source
    * scan, and nothing is materialized until the caller acts on a table.
    */
  def readAllAsOf(envelope: DataFrame, specs: Seq[TableSpec], maxSeq: Long,
      logicalDeletes: Boolean = false): Map[String, DataFrame] =
    specs.map(sp => sp.fullTableName ->
      stateAsOf(envelope, sp, maxSeq, logicalDeletes = logicalDeletes)).toMap
}
