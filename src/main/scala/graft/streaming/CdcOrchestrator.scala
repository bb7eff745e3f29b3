package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.cdc.CdcPipeline
import graft.inspect.Inspection
import graft.model.TableSpec
import graft.sink.LocalParquetSink

/** Multi-table fan-out orchestration — the reference's two entry points
  * re-expressed in-process (R30 `add_new_tables` add_output.py:458-561, R31
  * `update_existing_tables` :564-669, R32 idempotence registry :512-516).
  *
  * One streaming query per discovered table (each with its own checkpoint
  * and sink), discovery from the data itself (R25: distribution of the
  * derived full table name), include/exclude filtering (R26), and the
  * already-running registry check that makes repeated invocation a no-op.
  */
object CdcOrchestrator {

  final case class Running(
      table: String,
      spec: CdcStreamSpec,
      query: org.apache.spark.sql.streaming.StreamingQuery)

  /** R25: tables present in the stream, via the derived full_table_name. */
  def discoverTables(spark: SparkSession, inputDir: String): Seq[String] =
    Inspection.tables(CdcPipeline.readBatch(spark, inputDir))
      .collect().map(_.getString(0)).toSeq.sorted

  /** R30 + R32: start a pipeline for every discovered table that (a) passes
    * include/exclude, (b) has a columns-file spec (the reference skips
    * tables it can't type), and (c) isn't already running.
    *
    * `extraPk` (R13, add_output.py:9-18,553-555): when configured, every
    * started table gets the column appended to its spec as a primary key
    * (the reference's `add_new_column(..., is_primary_key=True,
    * **EXTRA_PK_COLUMN)` right after `add_output`), so the sink merges on
    * (primary_key, row_<extraPk>). A column already present in the spec is
    * promoted to PK instead of duplicated.
    */
  def addNewTables(
      spark: SparkSession,
      inputDir: String,
      columnsPath: String,
      sinkRoot: String,
      checkpointRoot: String,
      include: Seq[String],
      exclude: Seq[String],
      running: Map[String, Running] = Map.empty,
      logicalDeletes: Boolean = false,
      extraPk: Option[graft.model.ColSpec] = None,
      // sink per table directory — default local parquet; pass e.g.
      // `new PartitionedParquetSink(_, nBuckets = 128)` for the bucketed
      // layout, or a warehouse-backed implementation
      sinkFactory: String => graft.sink.UpsertSink = new LocalParquetSink(_)): Map[String, Running] = {
    val specs = TableSpec.loadCsv(columnsPath)
    val discovered = discoverTables(spark, inputDir)
      .filter(t => include.isEmpty || include.contains(t))
      .filterNot(exclude.contains)
    val toStart = discovered
      .filterNot(running.contains)       // R32: exists ⇒ skip
      .filter(specs.contains)            // no spec ⇒ skip (reference behavior)
    val started = toStart.map { t =>
      val safe = t.replace('.', '_')
      val spec = CdcStreamSpec(
        inputDir, s"$checkpointRoot/$safe", withExtraPk(specs(t), extraPk),
        sinkFactory(s"$sinkRoot/$safe"),
        logicalDeletes = logicalDeletes,
        extraPk = extraPk.map(_.name))
      t -> Running(t, spec, CdcStream.start(spark, spec))
    }
    running ++ started
  }

  /** R13: append (or promote) the configured extra primary-key column. */
  private def withExtraPk(table: TableSpec,
      extraPk: Option[graft.model.ColSpec]): TableSpec = extraPk match {
    case None => table
    case Some(pk) if table.colNames.contains(pk.name) =>
      table.copy(cols = table.cols.map(c =>
        if (c.name == pk.name) c.copy(isPrimaryKey = true) else c))
    case Some(pk) => table.copy(cols = table.cols :+ pk.copy(isPrimaryKey = true))
  }

  /** R30 over an arbitrary TRANSPORT: the same fan-out contract as
    * [[addNewTables]], but discovery and the per-table streams ride a
    * [[CdcSource]] factory instead of a file listing — one consumer PER
    * TABLE PIPELINE (the Kafka consumer-group shape: each pipeline
    * checkpoints independently, so each owns its own delivery cursor;
    * [[KafkaLikeSource.group]] is the test-double factory, a
    * per-group-id `readStream.format("kafka")` reader the production one).
    * Discovery replays the transport's retained log (`batch`) — the same
    * data-derived table distribution R25 reads from the staged files.
    */
  def addNewTablesFromSource(
      spark: SparkSession,
      consumerFactory: () => CdcSource,
      columnsPath: String,
      sinkRoot: String,
      checkpointRoot: String,
      include: Seq[String],
      exclude: Seq[String],
      running: Map[String, Running] = Map.empty,
      logicalDeletes: Boolean = false,
      extraPk: Option[graft.model.ColSpec] = None,
      sinkFactory: String => graft.sink.UpsertSink = new LocalParquetSink(_)): Map[String, Running] = {
    val specs = TableSpec.loadCsv(columnsPath)
    val discovered = Inspection.tables(consumerFactory().batch(spark))
      .collect().map(_.getString(0)).toSeq.sorted
      .filter(t => include.isEmpty || include.contains(t))
      .filterNot(exclude.contains)
    val toStart = discovered
      .filterNot(running.contains)       // R32: exists ⇒ skip
      .filter(specs.contains)            // no spec ⇒ skip (reference behavior)
    val started = toStart.map { t =>
      val safe = t.replace('.', '_')
      val spec = CdcStreamSpec(
        inputDir = "", s"$checkpointRoot/$safe", withExtraPk(specs(t), extraPk),
        sinkFactory(s"$sinkRoot/$safe"),
        logicalDeletes = logicalDeletes,
        extraPk = extraPk.map(_.name),
        source = Some(consumerFactory()))
      t -> Running(t, spec, CdcStream.start(spark, spec))
    }
    running ++ started
  }

  /** R31: evolution pass over every running table — stop/backfill/restart
    * whichever ones grew new columns; others keep running untouched.
    */
  def updateExistingTables(
      spark: SparkSession,
      running: Map[String, Running],
      udtOf: String => String = _ => "varchar"): Map[String, Running] =
    running.map { case (t, r) =>
      SchemaEvolution.evolveAndRestart(spark, r.query, r.spec, udtOf) match {
        case Some((q2, spec2)) => t -> Running(t, spec2, q2)
        case None              => t -> r
      }
    }

  def stopAll(running: Map[String, Running]): Unit =
    running.values.foreach { r => r.query.stop(); r.query.awaitTermination() }
}
