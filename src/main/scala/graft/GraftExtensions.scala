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
  * (`SELECT * FROM bm25_search('/idx', 'query terms', 20)`). Each TVF
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
  }
}
