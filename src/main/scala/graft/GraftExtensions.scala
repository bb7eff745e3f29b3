package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library entry point for `spark.sql.extensions` (SURVEY §7.5): installs
  * every graft Catalyst extension at session build time, so a deployment
  * enables the whole engine with one conf —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Installed: the codegen scalar expressions (`cosine_sim`, `hamming`,
  * `bmp_ahash`, the bloom pair), the as-of join planner strategy, and the
  * LLM-pipeline TABLE functions — `bm25_search`, `phrase_search`,
  * `knn_search`, `lsh_candidates` — so a SQL-only client can run retrieval,
  * ANN and dedup candidate generation with zero Scala
  * (`SELECT * FROM bm25_search('/idx', 'query terms', 20)`), plus the
  * table-format admin/DML surface: `table_history`, `table_changes`,
  * `snapshot_merge` (SQL upsert into a snapshot table), `table_follow`
  * (one incremental bronze→silver hop), and the matview lifecycle
  * (`matagg_define`/`matjoin_define`/`matview_load`/`matview_refresh`/
  * `matview_unregister`). Each TVF
  * builds the SAME DataFrame plan its Scala twin produces, so plan shape,
  * pruning and scoring are shared, not reimplemented. The in-process
  * alternatives remain for sessions built without the conf
  * (`GraftFunctions.register`, `AsOf.join`'s experimental-strategy patch).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // ---- TVF argument plumbing: table-function arguments arrive as Catalyst
  // expressions; the operator surfaces take driver values, so arguments
  // must be foldable (literals or literal expressions)
  private def litVal(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal")
    val v = e.eval()
    require(v != null, s"$what must not be null")
    v
  }
  private def litStr(e: Expression, what: String): String = litVal(e, what).toString
  private def litInt(e: Expression, what: String): Int = litVal(e, what) match {
    case n: java.lang.Number => n.intValue()
    case other => other.toString.toInt
  }
  private def litFloats(e: Expression, what: String): Array[Float] = {
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    CatalystTypeConverters.convertToScala(litVal(e, what), e.dataType) match {
      case s: Seq[_] => s.map {
        case n: java.lang.Number => n.floatValue()
        case o => sys.error(s"$what must be a numeric array, got element $o")
      }.toArray
      case o => sys.error(s"$what must be an array literal, got $o")
    }
  }
  private def terms(e: Expression, what: String): Seq[String] =
    litStr(e, what).split("\\s+").toSeq.filter(_.nonEmpty)

  /** The view manifest's recorded max seq — the applied source version for
    * aggregates, the packed (fact, dim) cut for joins.
    */
  private def rawApplied(m: graft.sink.MaintainedView): Option[Long] =
    m.sink.currentVersion.flatMap(v =>
      graft.sink.SnapshotParquetSink.manifestMaxSeq(m.sink.dir, v))

  /** One-row status frame for the matview admin table functions. */
  private def mvStatus(spark: SparkSession, srcDir: String, aggDir: String,
      applied: Option[Long]): LogicalPlan = {
    import spark.implicits._
    Seq((srcDir, aggDir, applied.getOrElse(-1L)))
      .toDF("source_dir", "agg_dir", "applied_version")
      .queryExecution.logical
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // ---- table functions (SQL-only pipeline surface)
    ext.injectTableFunction((
      FunctionIdentifier("bm25_search"),
      new ExpressionInfo(classOf[graft.sink.TextIndexStore].getName, "bm25_search"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "bm25_search(indexDir, query, k)")
        val store = new graft.sink.TextIndexStore(litStr(exprs(0), "indexDir"))
        store.search(SparkSession.active, terms(exprs(1), "query"),
          litInt(exprs(2), "k")).queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("phrase_search"),
      new ExpressionInfo(classOf[graft.sink.TextIndexStore].getName, "phrase_search"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "phrase_search(indexDir, phrase, k)")
        val store = new graft.sink.TextIndexStore(litStr(exprs(0), "indexDir"))
        store.phraseSearch(SparkSession.active, terms(exprs(1), "phrase"),
          litInt(exprs(2), "k")).queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("knn_search"),
      new ExpressionInfo(classOf[graft.sink.VectorIndexStore].getName, "knn_search"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4, "knn_search(indexDir, queryEmbedding, k, nProbe)")
        val spark = SparkSession.active
        import spark.implicits._
        val store = new graft.sink.VectorIndexStore(litStr(exprs(0), "indexDir"))
        val q = Seq((0L, litFloats(exprs(1), "queryEmbedding")))
          .toDF("vec_id", "embedding")
        store.search(spark, q, litInt(exprs(2), "k"), litInt(exprs(3), "nProbe"))
          .select("n_id", "cos").queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("table_history"),
      new ExpressionInfo(classOf[graft.sink.SnapshotParquetSink].getName, "table_history"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "table_history(tableDir)")
        new graft.sink.SnapshotParquetSink(litStr(exprs(0), "tableDir"))
          .history(SparkSession.active).queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo(classOf[graft.sink.SnapshotParquetSink].getName, "table_changes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "table_changes(tableDir, fromVersion, toVersion)")
        new graft.sink.SnapshotParquetSink(litStr(exprs(0), "tableDir"))
          .changesBetween(SparkSession.active,
            litInt(exprs(1), "fromVersion").toLong, litInt(exprs(2), "toVersion").toLong)
          .queryExecution.logical: LogicalPlan
      }))
    // snapshot-table READ for SQL-only clients: Spark's SQL-on-files
    // resolution (`FROM format.`path``) only admits file formats, not DSv2
    // providers, so the read face is a TVF like the rest of the surface —
    // same DSv2 scan underneath (bucket/stats/bloom pruning included)
    ext.injectTableFunction((
      FunctionIdentifier("snapshot_read"),
      new ExpressionInfo(classOf[graft.sink.SnapshotParquetSink].getName, "snapshot_read"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1 || exprs.length == 2,
          "snapshot_read(tableDir[, asOfVersion])")
        val spark = SparkSession.active
        val reader = spark.read.format("graft-snapshot")
        val withAsOf =
          if (exprs.length == 2)
            reader.option("asOf", litInt(exprs(1), "asOfVersion").toLong)
          else reader
        withAsOf.load(litStr(exprs(0), "tableDir"))
          .queryExecution.logical: LogicalPlan
      }))
    // per-bucket manifest introspection — the ops face for layout sizing
    // and skipping-coverage questions ("which buckets carry stats/bloom
    // lines, how big are the files"): everything from the manifest plus
    // one ContentSummary call per bucket, never a data read
    ext.injectTableFunction((
      FunctionIdentifier("table_files"),
      new ExpressionInfo(classOf[graft.sink.SnapshotParquetSink].getName, "table_files"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1 || exprs.length == 2,
          "table_files(tableDir[, version])")
        val spark = SparkSession.active
        val dir = litStr(exprs(0), "tableDir")
        val vs = graft.sink.SnapshotParquetSink.versions(dir)
        require(vs.nonEmpty, s"no snapshot published at $dir")
        val v = if (exprs.length == 2) litInt(exprs(1), "version").toLong else vs.last
        val (_, entries) = graft.sink.SnapshotParquetSink.manifest(dir, v)
        val stats = graft.sink.SnapshotParquetSink.manifestStats(dir, v)
        val blooms = graft.sink.SnapshotParquetSink.manifestBlooms(dir, v)
        val rows = entries.toSeq.sortBy(_._1).map { case (b, rel) =>
          val (files, bytes) = graft.engine.Dfs.contentSummary(
            new org.apache.hadoop.fs.Path(s"$dir/$rel"))
          org.apache.spark.sql.Row(b, rel, files, bytes,
            stats.get(b).map(_.keys.toSeq.sorted.mkString(",")).getOrElse(""),
            blooms.get(b).map(_.keys.toSeq.sorted.mkString(",")).getOrElse(""))
        }
        import org.apache.spark.sql.types._
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(
            StructField("bucket", IntegerType, nullable = false),
            StructField("path", StringType, nullable = false),
            StructField("files", LongType, nullable = false),
            StructField("bytes", LongType, nullable = false),
            StructField("stats_cols", StringType, nullable = false),
            StructField("bloom_cols", StringType, nullable = false))))
          .queryExecution.logical: LogicalPlan
      }))
    // ---- SQL DML for snapshot tables: merge any table/temp view into a
    // snapshot table (last-write-wins upsert, atomic manifest commit) —
    // with the V1 writer fallback this makes the whole CDC apply path
    // reachable from pure SQL. Existing tables self-align their committed
    // layout via forTable (nBuckets, keys, cluster, stats, blooms).
    //
    // SIDE-EFFECT CAVEAT (applies to snapshot_merge, table_follow and
    // matagg_define alike): the write executes inside the TVF's
    // logical-plan BUILDER, so every analysis of the statement — EXPLAIN,
    // view expansion, a retried/re-resolved plan — performs another merge
    // and publishes another table version. Content is idempotent (LWW
    // keyed replay converges bit-identically), but version/commit churn is
    // visible in history(); don't EXPLAIN these statements in production,
    // and don't wrap them in views.
    ext.injectTableFunction((
      FunctionIdentifier("snapshot_merge"),
      new ExpressionInfo(classOf[graft.sink.SnapshotParquetSink].getName, "snapshot_merge"),
      (exprs: Seq[Expression]) => {
        require(exprs.length >= 3 && exprs.length <= 7,
          "snapshot_merge(tableDir, sourceTableOrView, keysCsv[, seqCol[, " +
            "deleteCol[, nBuckets[, layout]]]]) — layout (FIRST commit only): " +
            "'stats=a,b;bloom=c;cluster=x:0:100'")
        val spark = SparkSession.active
        val dir = litStr(exprs(0), "tableDir")
        val batch0 = spark.table(litStr(exprs(1), "sourceTableOrView"))
        val keys = litStr(exprs(2), "keys").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val seqCol = if (exprs.length > 3) litStr(exprs(3), "seqCol") else "seq"
        val delCol = if (exprs.length > 4) Some(litStr(exprs(4), "deleteCol")) else None
        // layout arg (FIRST commit only — existing tables self-align via
        // forTable): 'stats=a,b;bloom=c;cluster=x:0:100,y:0:50'
        def csvOf(s: String) = s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        val layout: Map[String, String] =
          if (exprs.length > 6)
            litStr(exprs(6), "layout").split(';').toSeq.map(_.trim).filter(_.nonEmpty)
              .map { kv =>
                val Array(k, v) = kv.split("=", 2)
                k.trim.toLowerCase(java.util.Locale.ROOT) -> v.trim
              }.toMap
          else Map.empty
        layout.keys.foreach(k => require(Set("stats", "bloom", "cluster")(k),
          s"unknown layout key '$k' — expected stats|bloom|cluster"))
        val sink =
          if (graft.sink.SnapshotParquetSink.versions(dir).nonEmpty)
            graft.sink.SnapshotParquetSink.forTable(dir)
          else new graft.sink.SnapshotParquetSink(dir,
            nBuckets = if (exprs.length > 5) litInt(exprs(5), "nBuckets") else 16,
            statsCols = layout.get("stats").map(csvOf).getOrElse(Nil),
            clusterBy = layout.get("cluster").map(csvOf(_).map { spec =>
              spec.split(':') match {
                case Array(n, lo, hi) =>
                  graft.sink.SnapshotParquetSink.ClusterCol(n, lo.toLong, hi.toLong)
                case _ => sys.error(s"cluster entry '$spec' must be col:lo:hi")
              }
            }).getOrElse(Nil),
            bloomCols = layout.get("bloom").map(csvOf).getOrElse(Nil))
        val (batch, del) = delCol match {
          case Some(c) =>
            require(batch0.columns.contains(c), s"delete column '$c' absent from the source")
            (batch0, c)
          case None => (batch0.withColumn("__is_deleted",
            org.apache.spark.sql.functions.lit(false)), "__is_deleted")
        }
        sink.merge(batch, keys, seqCol, del)
        val info = sink.lastCommit
        import spark.implicits._
        Seq((dir, info.map(_.version).getOrElse(-1L),
          info.map(_.attempts).getOrElse(0), info.map(_.rebases).getOrElse(0)))
          .toDF("table_dir", "version", "attempts", "rebases")
          .queryExecution.logical: LogicalPlan
      }))
    // one incremental table-to-table hop from SQL ([[graft.streaming
    // .TableFollower]]): catch the downstream table up to the upstream's
    // head, applying an optional ';'-separated selectExpr list as the
    // row-wise transform (must pass keys, seqCol and is_deleted through —
    // '*' projects everything: "*; upper(note) AS note_upper").
    ext.injectTableFunction((
      FunctionIdentifier("table_follow"),
      new ExpressionInfo(classOf[graft.streaming.TableFollower].getName, "table_follow"),
      (exprs: Seq[Expression]) => {
        require(exprs.length >= 4 && exprs.length <= 6,
          "table_follow(upstreamDir, downstreamDir, name, keysCsv[, seqCol[, selectExprsSemicolonSep]])")
        val spark = SparkSession.active
        val upDir = litStr(exprs(0), "upstreamDir")
        val downDir = litStr(exprs(1), "downstreamDir")
        val name = litStr(exprs(2), "name")
        val keys = litStr(exprs(3), "keys").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val seqCol = if (exprs.length > 4) litStr(exprs(4), "seqCol") else "seq"
        val selects = if (exprs.length > 5)
          litStr(exprs(5), "selectExprs").split(";").toSeq.map(_.trim).filter(_.nonEmpty)
        else Seq("*")
        val down =
          if (graft.sink.SnapshotParquetSink.versions(downDir).nonEmpty)
            graft.sink.SnapshotParquetSink.forTable(downDir)
          else new graft.sink.SnapshotParquetSink(downDir,
            // default the downstream layout to the upstream's bucket count —
            // the hop preserves row volume, so the same sizing rule applies
            nBuckets = graft.sink.SnapshotParquetSink.versions(upDir).lastOption
              .map(v => graft.sink.SnapshotParquetSink.manifest(upDir, v)._1)
              .getOrElse(16))
        val f = new graft.streaming.TableFollower(upDir, down, name)
        val applied = f.catchUp(spark, keys, seqCol)(_.selectExpr(selects: _*))
        import spark.implicits._
        Seq((upDir, downDir, applied.orElse(f.appliedVersion).getOrElse(-1L),
          applied.isDefined))
          .toDF("upstream_dir", "downstream_dir", "applied_version", "advanced")
          .queryExecution.logical: LogicalPlan
      }))
    // ---- multi-table transaction faces: COMMIT a consistent cut pinning
    // the listed members at their current versions (the end-of-transaction
    // call), and READ a member through a cut. Unlike snapshot_merge /
    // table_follow (content-idempotent — a re-applied no-op), a catalog
    // commit publishes reader-visible history per invocation, so its side
    // effect is DEFERRED to execution via [[graft.plans
    // .CatalogCommitCommand]]: EXPLAIN / view expansion / re-analysis
    // construct the node without cutting. onConflict names the same-table
    // multi-writer rule ([[PinConflict]]): 'advance' (default, never
    // regress), 'refuse' (throw when another writer pinned the same table
    // newer), 'lastwins' (raw override).
    ext.injectTableFunction((
      FunctionIdentifier("catalog_commit"),
      new ExpressionInfo(classOf[graft.sink.SnapshotCatalog].getName, "catalog_commit"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          "catalog_commit(catalogDir, tablesCsv[, onConflict: advance|refuse|lastwins])")
        val dir = litStr(exprs(0), "catalogDir")
        val tables = litStr(exprs(1), "tables")
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val mode = (if (exprs.length > 2) litStr(exprs(2), "onConflict")
          else "advance").toLowerCase(java.util.Locale.ROOT) match {
          case "advance"  => graft.sink.PinConflict.Advance
          case "refuse"   => graft.sink.PinConflict.Refuse
          case "lastwins" => graft.sink.PinConflict.LastWins
          case other =>
            sys.error(s"onConflict must be advance|refuse|lastwins, got '$other'")
        }
        graft.plans.CatalogCommitCommand(dir, tables, mode): LogicalPlan
      }))
    // ---- retention faces: DESTRUCTIVE side effects, so both are
    // Commands ([[graft.plans.SnapshotVacuumCommand]] /
    // [[graft.plans.CatalogVacuumAllCommand]]) — EXPLAIN / re-analysis
    // of a history-deleting statement must delete nothing; execution
    // vacuums exactly once. minOrphanAgeMs defaults to the library's
    // one-hour concurrent-writer protection window.
    ext.injectTableFunction((
      FunctionIdentifier("snapshot_vacuum"),
      new ExpressionInfo(classOf[graft.sink.SnapshotParquetSink].getName, "snapshot_vacuum"),
      (exprs: Seq[Expression]) => {
        require(exprs.length >= 2 && exprs.length <= 3,
          "snapshot_vacuum(tableDir, keepLast[, minOrphanAgeMs])")
        graft.plans.SnapshotVacuumCommand(
          litStr(exprs(0), "tableDir"),
          litInt(exprs(1), "keepLast"),
          if (exprs.length > 2) litInt(exprs(2), "minOrphanAgeMs").toLong
          else 3600000L): LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("catalog_vacuum_all"),
      new ExpressionInfo(classOf[graft.sink.SnapshotCatalog].getName, "catalog_vacuum_all"),
      (exprs: Seq[Expression]) => {
        require(exprs.length >= 2 && exprs.length <= 3,
          "catalog_vacuum_all(catalogDir, keepLast[, minOrphanAgeMs])")
        graft.plans.CatalogVacuumAllCommand(
          litStr(exprs(0), "catalogDir"),
          litInt(exprs(1), "keepLast"),
          if (exprs.length > 2) litInt(exprs(2), "minOrphanAgeMs").toLong
          else 3600000L): LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("catalog_history"),
      new ExpressionInfo(classOf[graft.sink.SnapshotCatalog].getName, "catalog_history"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "catalog_history(catalogDir)")
        val spark = SparkSession.active
        val cat = new graft.sink.SnapshotCatalog(litStr(exprs(0), "catalogDir"))
        import spark.implicits._
        // one row per (cut, table) pin plus the cut's epoch stamps as a
        // sorted csv — the DESCRIBE HISTORY of the transaction layer, read
        // from catalog manifests alone (never a data scan)
        cat.versions.flatMap { v =>
          val ep = cat.epochStamps(v).toSeq.sortBy(_._1)
            .map { case (w, (b, at)) => s"$w=$b@$at" }.mkString(",")
          cat.pins(v).toSeq.sortBy(_._1).map { case (t, tv) => (v, t, tv, ep) }
        }.toDF("catalog_version", "table_name", "pinned_version", "epochs")
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectTableFunction((
      FunctionIdentifier("catalog_read"),
      new ExpressionInfo(classOf[graft.sink.SnapshotCatalog].getName, "catalog_read"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          "catalog_read(catalogDir, table[, asOfCatalogVersion])")
        val spark = SparkSession.active
        val reader = spark.read.format("graft-catalog")
          .option("table", litStr(exprs(1), "table"))
        val withAsOf =
          if (exprs.length == 3)
            reader.option("asOfCatalog", litInt(exprs(2), "asOfCatalogVersion").toLong)
          else reader
        withAsOf.load(litStr(exprs(0), "catalogDir"))
          .queryExecution.logical: LogicalPlan
      }))
    // ---- materialized views from SQL: define-or-advance an IVM aggregate
    // over a snapshot table and register it for automatic query rewrite
    // ([[graft.plans.MatViewRewrite]]). Aggregate expressions are
    // ';'-separated SQL (commas appear inside calls): "sum(v) AS sv;
    // count(v) AS nv". Re-running the define is idempotent: refresh only
    // advances, registration is last-wins.
    ext.injectTableFunction((
      FunctionIdentifier("matagg_define"),
      new ExpressionInfo(classOf[graft.sink.MaterializedAgg].getName, "matagg_define"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4 || exprs.length == 5,
          "matagg_define(sourceDir, aggDir, groupColsCsv, aggExprsSemicolonSep[, nBuckets])")
        val spark = SparkSession.active
        val srcDir = litStr(exprs(0), "sourceDir")
        val aggDir = litStr(exprs(1), "aggDir")
        val groups = litStr(exprs(2), "groupCols")
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val aggCols = litStr(exprs(3), "aggExprs")
          .split(";").toSeq.map(_.trim).filter(_.nonEmpty)
          .map(org.apache.spark.sql.functions.expr)
        val src = graft.sink.SnapshotParquetSink.forTable(srcDir)
        val sink =
          if (graft.sink.SnapshotParquetSink.versions(aggDir).nonEmpty)
            graft.sink.SnapshotParquetSink.forTable(aggDir)
          else new graft.sink.SnapshotParquetSink(aggDir,
            nBuckets = if (exprs.length == 5) litInt(exprs(4), "nBuckets") else 16)
        val m = new graft.sink.MaterializedAgg(src, sink, groups, aggCols)
        // persist the definition into the view dir (once): the view becomes
        // a warehouse object any process can matview_load and refresh. A
        // re-define must MATCH the stored spec — divergent args would fork
        // the view's meaning between disk and this session
        val aggSql = litStr(exprs(3), "aggExprs")
          .split(";").toSeq.map(_.trim).filter(_.nonEmpty)
        if (!graft.sink.ViewSpecs.defined(aggDir))
          graft.sink.ViewSpecs.saveAgg(m, aggSql)
        else graft.sink.ViewSpecs.requireConsistent(aggDir,
          graft.sink.ViewSpecs.aggDefinition(m, aggSql))
        val applied = m.refresh(spark).orElse(m.appliedVersion)
        graft.sink.MaterializedAgg.register(m)
        mvStatus(spark, srcDir, aggDir, applied)
      }))
    ext.injectTableFunction((
      FunctionIdentifier("matjoin_define"),
      new ExpressionInfo(classOf[graft.sink.MaterializedJoin].getName, "matjoin_define"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 5 || exprs.length == 6,
          "matjoin_define(factDir, dimDir, viewDir, joinKeysCsv, dimColsCsv[, joinType])")
        val spark = SparkSession.active
        val factDir = litStr(exprs(0), "factDir")
        val dimDir = litStr(exprs(1), "dimDir")
        val viewDir = litStr(exprs(2), "viewDir")
        val jk = litStr(exprs(3), "joinKeys").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val dc = litStr(exprs(4), "dimCols").split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val jt = if (exprs.length == 6) litStr(exprs(5), "joinType") else "left_outer"
        val m = new graft.sink.MaterializedJoin(
          graft.sink.SnapshotParquetSink.forTable(factDir),
          graft.sink.SnapshotParquetSink.forTable(dimDir),
          if (graft.sink.SnapshotParquetSink.versions(viewDir).nonEmpty)
            graft.sink.SnapshotParquetSink.forTable(viewDir)
          else new graft.sink.SnapshotParquetSink(viewDir),
          jk, dc, jt)
        if (!graft.sink.ViewSpecs.defined(viewDir))
          graft.sink.ViewSpecs.saveJoin(m, jk, dc, jt)
        else graft.sink.ViewSpecs.requireConsistent(viewDir,
          graft.sink.ViewSpecs.joinDefinition(m, jk, dc, jt))
        m.refreshIfReady(spark)
        mvStatus(spark, s"$factDir,$dimDir", viewDir, rawApplied(m))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("matview_load"),
      new ExpressionInfo(classOf[graft.sink.ViewSpecs.type].getName, "matview_load"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "matview_load(viewDir)")
        val spark = SparkSession.active
        val viewDir = litStr(exprs(0), "viewDir")
        // stateless refresh cycle: rehydrate the persisted definition,
        // advance it, and (aggregates) register it for query rewrite
        val m = graft.sink.ViewSpecs.load(spark, viewDir)
        m.refreshIfReady(spark)
        m match {
          case a: graft.sink.MaterializedAgg => graft.sink.MaterializedAgg.register(a)
          case _ =>
        }
        mvStatus(spark, "", viewDir, rawApplied(m))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("matview_refresh"),
      new ExpressionInfo(classOf[graft.sink.MaterializedAgg].getName, "matview_refresh"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "matview_refresh(sourceDir)")
        val spark = SparkSession.active
        val srcDir = litStr(exprs(0), "sourceDir")
        val m = graft.sink.MaterializedAgg.registered(srcDir).getOrElse(
          sys.error(s"no materialized view registered for source $srcDir — " +
            "matagg_define it first"))
        val applied = m.refresh(spark).orElse(m.appliedVersion)
        mvStatus(spark, srcDir, m.sink.dir, applied)
      }))
    ext.injectTableFunction((
      FunctionIdentifier("matview_unregister"),
      new ExpressionInfo(classOf[graft.sink.MaterializedAgg].getName, "matview_unregister"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "matview_unregister(sourceDir)")
        val spark = SparkSession.active
        val srcDir = litStr(exprs(0), "sourceDir")
        val m = graft.sink.MaterializedAgg.registered(srcDir)
        m.foreach(graft.sink.MaterializedAgg.unregister)
        mvStatus(spark, srcDir, m.map(_.sink.dir).getOrElse(""),
          m.flatMap(_.appliedVersion))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("lsh_candidates"),
      new ExpressionInfo(classOf[graft.llm.Dedup.type].getName, "lsh_candidates"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "lsh_candidates(docsTableOrView)")
        val spark = SparkSession.active
        val docs = spark.table(litStr(exprs(0), "docsTableOrView"))
        graft.llm.Dedup.minhashLsh(docs, dictionary = false)(identity)
          .queryExecution.logical: LogicalPlan
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
        graft.functions.CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[graft.functions.HammingDistance].getName, "hamming"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"hamming requires exactly 2 arguments, got ${exprs.length}")
        graft.functions.HammingDistance(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bmp_ahash"),
      new ExpressionInfo(classOf[graft.functions.BmpAHash].getName, "bmp_ahash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"bmp_ahash requires exactly 1 argument, got ${exprs.length}")
        graft.functions.BmpAHash(exprs(0))
      }))
    // runtime-filter primitives (see GraftFunctions.register / BloomPrune)
    ext.injectFunction((
      FunctionIdentifier("bloom_build"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_build"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"bloom_build(key, estimatedItems): got ${exprs.length} args")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(0))),
          org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
            org.apache.spark.sql.types.LongType))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"bloom_might_contain(bloom, key): got ${exprs.length} args")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1))))
      }))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfColumnPruning)
    ext.injectOptimizerRule(_ => graft.plans.MatViewRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinBinning)
  }
}
