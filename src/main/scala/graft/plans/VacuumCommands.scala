package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Execution-time bodies of the SQL retention faces — like
  * [[CatalogCommitCommand]], these are Commands because the side effect
  * is DESTRUCTIVE and not idempotent-by-content: EXPLAIN / view expansion
  * / plan re-analysis of a statement that deletes history must delete
  * nothing (Spark's CommandExecutionMode.SKIP rule); execution runs the
  * vacuum exactly once and returns what it dropped.
  */
final case class SnapshotVacuumCommand(
    tableDir: String,
    keepLast: Int,
    minOrphanAgeMs: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_dir", StringType, nullable = false)(),
    AttributeReference("dropped_manifests", IntegerType, nullable = false)(),
    AttributeReference("deleted_orphan_roots", IntegerType, nullable = false)(),
    // "too young to drop" ≠ "nothing to drop" — the age floor's holdback
    AttributeReference("withheld_by_age_floor", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val sink = graft.sink.SnapshotParquetSink.forTable(tableDir)
    val (m, o) = sink.vacuum(keepLast, minOrphanAgeMs)
    Seq(Row(tableDir, m, o, sink.lastVacuumWithheld))
  }
}

/** Warehouse-wide retention from SQL ([[graft.sink.SnapshotCatalog
  * .vacuumAll]]): catalog history expires first, then every member the
  * surviving cuts reference vacuums to its pinned versions — one row per
  * member plus the `_catalog` pseudo-row.
  */
final case class CatalogVacuumAllCommand(
    catalogDir: String,
    keepLast: Int,
    minOrphanAgeMs: Long) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("dropped_manifests", IntegerType, nullable = false)(),
    AttributeReference("deleted_orphan_roots", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    new graft.sink.SnapshotCatalog(catalogDir)
      .vacuumAll(keepLast, minOrphanAgeMs)
      .toSeq.sortBy(_._1)
      .map { case (name, (m, o)) => Row(name, m, o) }
  }
}
