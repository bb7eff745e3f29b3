package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

/** Execution-time body of the `catalog_commit(...)` table function: the
  * TVF builder only CONSTRUCTS this node; the catalog cut publishes when
  * the statement RUNS. The plan-builder-side-effect TVFs (snapshot_merge,
  * table_follow) are content-idempotent — re-analysis re-applies a no-op —
  * but a catalog commit is NOT: every invocation publishes a reader-visible
  * catalog version, so EXPLAIN / view expansion / plan re-analysis must be
  * side-effect free for it. As a Command, EXPLAIN analyzes it under
  * CommandExecutionMode.SKIP (Spark's own "EXPLAIN INSERT does not insert"
  * rule) and execution publishes exactly one cut.
  */
final case class CatalogCommitCommand(
    catalogDir: String,
    tables: Seq[String],
    onConflict: graft.sink.PinConflict) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("catalog_dir", StringType, nullable = false)(),
    AttributeReference("catalog_version", LongType, nullable = false)(),
    AttributeReference("table_name", StringType, nullable = false)(),
    AttributeReference("pinned_version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = new graft.sink.SnapshotCatalog(catalogDir)
    val v = cat.commitCurrent(tables, onConflict)
    cat.pins(v).toSeq.sortBy(_._1).map { case (t, tv) =>
      Row(catalogDir, v, t, tv)
    }
  }
}
