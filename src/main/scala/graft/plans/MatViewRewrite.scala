package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, EqualTo, Expression, KnownNotNull, Literal, NamedExpression, Not}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, lit, max, min, sum}
import org.apache.spark.sql.graftbridge.Bridge

import graft.sink.{DeleteMode, MaterializedAgg}
import graft.sources.GraftSnapshotTable

/** Materialized-view query rewrite — the warehouse-side payoff of
  * [[graft.sink.MaterializedAgg]]: a `GROUP BY` over a snapshot table whose
  * grouping and aggregate expressions are answerable from a registered,
  * CURRENT view is served from the maintained aggregate table (O(groups)
  * scan) instead of the source (O(table) scan + shuffle). At 100 TB this is
  * the difference between a dashboard query re-shuffling the fact table and
  * it reading a few thousand pre-folded rows.
  *
  * Two match shapes:
  *   - **exact**: grouping equals the view's group columns — each output
  *     maps 1:1 to a view column; the replacement is a projection of the
  *     view, no aggregation at all.
  *   - **roll-up**: grouping is a (possibly empty — grand total) subset of
  *     the view's group columns and every aggregate re-folds from a view
  *     column: `sum(x)→sum(sum_x)`, `min(x)→min(min_x)`, `max(x)→max
  *     (max_x)`, `count(…)→coalesce(sum(n),0)` (the coalesce keeps the
  *     grand-total count 0, not null, when the view has zero live groups).
  *     DISTINCT / FILTER aggregates and avg do not re-fold — no rewrite.
  *     One view answers the whole drill-down family of a dashboard.
  *
  * Fires only when ALL of:
  *   - the aggregate's child is exactly a not-deleted read of a registered
  *     source table — pass-through projections stripped, one [[Filter]]
  *     whose whole condition is the tombstone test, a snapshot relation
  *     below (the `graft-snapshot` DSv2 relation, or the Scala read path's
  *     V1 parquet relation over the table's bucket files). Any extra
  *     predicate, derived column or join means the view does not answer the
  *     query: no rewrite, never a wrong answer.
  *   - expressions match the registered spec SEMANTICALLY: the spec's
  *     columns are resolved against the query's own child plan, so both
  *     sides share attribute ids and compare via `semanticEquals` (with
  *     same-type casts stripped — the optimizer folds those on the query
  *     side only). Output columns may be any subset/reordering/renaming.
  *   - the view is refreshed to EXACTLY the source version the query is
  *     pinned to (the DSv2 relation records it; the V1 shape recovers it
  *     by matching the scan's resolved file list against the manifests).
  *     Stale view ⇒ the original plan runs — freshness is a hard gate,
  *     not a best effort.
  *   - every replacement column's type equals the original output's (a
  *     refolded decimal sum widens precision again, for example — type
  *     mismatch means no rewrite, not a cast).
  *
  * The replacement keeps the original output attribute ids (aliased
  * matview columns, `KnownNotNull` where the original output was
  * non-nullable), so nothing above the Aggregate re-resolves. A failed
  * match tags the node and is skipped on later fixed-point iterations —
  * the manifest probes run once per query, not once per optimizer pass.
  * Kill switch: `spark.graft.matview.rewrite=false`.
  */
object MatViewRewrite extends Rule[LogicalPlan] {

  private val checked = TreeNodeTag[Boolean]("graft.matview.checked")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!MaterializedAgg.anyRegistered) return plan
    if (!conf.getConfString("spark.graft.matview.rewrite", "true").toBoolean) return plan
    plan.transformDown {
      case agg: Aggregate if agg.getTagValue(checked).isEmpty =>
        val replaced =
          try rewrite(agg)
          catch {
            case NonFatal(e) =>
              logWarning(s"matview rewrite skipped: ${e.getMessage}")
              None
          }
        replaced.getOrElse {
          agg.setTagValue(checked, true)
          agg
        }
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val spark = SparkSession.active
    for {
      (m, pinned, rel) <- sourceScan(agg.child)
      srcV <- pinned.orElse(m.source.currentVersion)
      aggV <- m.versionFor(srcV) // no matching refresh ⇒ stale ⇒ keep plan
      outs <- outputMapping(spark, m, agg, rel)
      plan <- replacement(spark, m, aggV, agg, outs)
    } yield plan
  }

  // ------------------------------------------------------------- matching

  /** The registered view, the scan's pinned source version (when the
    * relation carries one) and the relation node itself under `child` —
    * None unless the child is exactly a not-deleted read of a registered
    * source table. The relation node is returned because spec resolution
    * must happen against the FULL column set: by the time this rule runs,
    * column pruning has already stripped the child down to the query's own
    * references, which need not include every view column.
    */
  private def sourceScan(
      child: LogicalPlan): Option[(MaterializedAgg, Option[Long], LogicalPlan)] =
    stripPassThrough(child) match {
      case Filter(cond, inner) if isNotDeleted(cond) =>
        val rel = stripPassThrough(inner)
        relation(rel).map { case (m, pinned) => (m, pinned, rel) }
      case _ => None
    }

  private def stripPassThrough(p: LogicalPlan): LogicalPlan = p match {
    case Project(plist, inner) if plist.forall(_.isInstanceOf[AttributeReference]) =>
      stripPassThrough(inner)
    case other => other
  }

  /** Is `cond`, whole, the tombstone filter? Accepts the forms the read
    * paths and SQL users produce — `NOT __is_deleted`, `__is_deleted =
    * false`, `NOT coalesce(__is_deleted, false)` — plus any conjoined
    * `isnotnull(__is_deleted)` terms the optimizer infers from them
    * (row-set-equivalent: NOT x already filters null x).
    */
  private def isNotDeleted(cond: Expression): Boolean =
    cond.references.toSeq match {
      case Seq(a) if a.name == "__is_deleted" =>
        val conjuncts = splitAnd(cond).filterNot {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(e) =>
            e.semanticEquals(a)
          case _ => false
        }
        conjuncts match {
          case Seq(one) =>
            Seq[Expression](
              Not(a),
              EqualTo(a, Literal(false)),
              EqualTo(Literal(false), a),
              Not(Coalesce(Seq(a, Literal(false)))))
              .exists(_.semanticEquals(one))
          case _ => false
        }
      case _ => false
    }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  private def relation(p: LogicalPlan): Option[(MaterializedAgg, Option[Long])] =
    p match {
      case r: DataSourceV2Relation =>
        r.table match {
          case t: GraftSnapshotTable =>
            MaterializedAgg.registered(t.snapshotDir)
              .map(m => (m, Some(t.snapshotVersion)))
          case _ => None
        }
      case l: LogicalRelation =>
        l.relation match {
          case h: HadoopFsRelation =>
            val roots = h.location.rootPaths
            if (roots.isEmpty) None
            else MaterializedAgg.registeredViews
              .find { m =>
                val dir = MaterializedAgg.normDir(m.source.dir)
                roots.forall(rp =>
                  Option(rp.toUri.getPath).exists(_.startsWith(dir + "/data/")))
              }
              .flatMap { m =>
                // the V1 scan is pinned to the FILE LIST resolved when the
                // DataFrame was built — recover its version by matching
                // against the manifests. Substituting "current" instead
                // would be a wrong answer when source + view advanced
                // between frame construction and this optimization.
                v1PinnedVersion(m, roots.flatMap(r => Option(r.toUri.getPath)))
                  .map(v => (m, Some(v)))
              }
          case _ => None
        }
      case _ => None
    }

  /** The source version whose manifest lists exactly these bucket files —
    * newest-first so the common "scan of the current version" resolves on
    * the first probe. None (no rewrite) for a file set no retained
    * manifest explains.
    */
  private def v1PinnedVersion(m: MaterializedAgg, paths: Seq[String]): Option[Long] = {
    val dir = MaterializedAgg.normDir(m.source.dir)
    val scanned = paths.map(_.stripPrefix(dir).stripPrefix("/")).toSet
    m.source.versions.reverse.find { v =>
      graft.sink.SnapshotParquetSink.manifest(m.source.dir, v)
        ._2.values.toSet == scanned
    }
  }

  /** Same-type casts fold on the (partially optimized) query side but not
    * on the analyzed-only expected side — strip them from both before
    * comparing.
    */
  private def normalize(e: Expression): Expression = e.transformUp {
    case c: Cast if c.child.dataType == c.dataType => c.child
  }

  private def matches(a: Expression, b: Expression): Boolean =
    normalize(a).semanticEquals(normalize(b))

  /** One output column of the rewritten query, over the matview frame. */
  private sealed trait OutCol
  /** A grouping key: the matview group column of this name. */
  private case class GroupOut(name: String) extends OutCol
  /** Exact grouping: the matview column already holds the value. */
  private case class DirectOut(name: String) extends OutCol
  /** Exact grouping: a per-row computation over matview columns (avg =
    * sum_x / n_x). */
  private case class ComputedOut(c: Column) extends OutCol
  /** Subset grouping: re-fold matview columns. */
  private case class RefoldOut(c: Column) extends OutCol

  /** For each output column of the user aggregate, how to produce it from
    * the matview — None when the view does not answer the query. The spec
    * is resolved against the query's OWN relation node (full column set,
    * untouched by column pruning), so both sides reference identical
    * attributes and compare by semantic equality, not by name strings.
    */
  private def outputMapping(spark: SparkSession, m: MaterializedAgg,
      agg: Aggregate, rel: LogicalPlan): Option[(Seq[String], Seq[OutCol])] = {
    val expected = Bridge.ofRows(spark, rel)
      .groupBy(m.groupCols.map(col): _*)
      .agg(m.aggs.head, m.aggs.tail: _*)
      .queryExecution.analyzed match {
        case a: Aggregate => a
        case _ => return None
      }
    val expGroup = expected.groupingExpressions
    // every user grouping key must BE one of the view's group columns
    val userGroupNames = agg.groupingExpressions.map { g =>
      expGroup.find(matches(g, _)) match {
        case Some(a: NamedExpression) => a.name
        case _                        => return None
      }
    }.distinct
    val exact = userGroupNames.size == expGroup.size
    // expected output = group attrs (name = matview group column) ++
    // aliased aggregates (alias = matview agg column, grouped() demands it)
    val expPairs: Seq[(Expression, String)] = expected.aggregateExpressions.map {
      case Alias(c, n)  => (c, n)
      case a: Attribute => (a, a.name)
      case other        => (other, other.sql)
    }
    val groupNameSet = expGroup.collect { case a: NamedExpression => a.name }.toSet
    val outs = agg.aggregateExpressions.map { ne =>
      val c = ne match {
        case Alias(c0, _) => c0
        case a            => a
      }
      expPairs.find(p => matches(p._1, c)) match {
        case Some((_, n)) if groupNameSet(n) =>
          // a bare group attribute in the select list — analysis guarantees
          // it is also a grouping key, so it survives a subset roll-up
          GroupOut(n)
        case Some((e, n)) =>
          if (exact) DirectOut(n)
          else refold(e, n).getOrElse(return None)
        case None => avgOut(c, expPairs, exact).getOrElse(return None)
      }
    }
    Some((userGroupNames, outs))
  }

  /** `avg(x)` decomposes when the view carries BOTH `sum(x)` and `count(x)`
    * (the non-null count — count(1) only equals it for non-nullable x,
    * which a parquet-read schema cannot promise): per group avg = sum_x /
    * n_x, rolled up avg = sum(sum_x) / sum(n_x). The division matches
    * Spark's own Average lowering (both sides cast to double for integral
    * input); decimal averages change precision under re-division and are
    * rejected by the replacement's type check.
    */
  private def avgOut(c: Expression, expPairs: Seq[(Expression, String)],
      exact: Boolean): Option[OutCol] = c match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case av: org.apache.spark.sql.catalyst.expressions.aggregate.Average =>
          def find(p: Expression => Boolean): Option[String] =
            expPairs.collectFirst {
              case (e: AggregateExpression, n)
                  if !e.isDistinct && e.filter.isEmpty && p(e.aggregateFunction) => n
            }
          val sumName = find {
            case s: Sum => matches(s.child, av.child)
            case _      => false
          }
          val cntName = find {
            case cnt: Count =>
              cnt.children.length == 1 && matches(cnt.children.head, av.child)
            case _ => false
          }
          (sumName, cntName) match {
            case (Some(s), Some(n)) =>
              if (exact) Some(ComputedOut(col(s) / col(n)))
              else Some(RefoldOut(sum(col(s)) / sum(col(n))))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** The re-aggregation of matview column `viewCol` that equals running the
    * view aggregate `e` at a coarser grouping — only for the decomposable
    * functions; DISTINCT/FILTER shapes never re-fold.
    */
  private def refold(e: Expression, viewCol: String): Option[RefoldOut] = e match {
    case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case _: Sum => Some(RefoldOut(sum(col(viewCol))))
        case _: Min => Some(RefoldOut(min(col(viewCol))))
        case _: Max => Some(RefoldOut(max(col(viewCol))))
        // per-group counts are sums of the view's counts; the coalesce keeps
        // a grand total over ZERO live groups at 0 instead of null
        case _: Count => Some(RefoldOut(coalesce(sum(col(viewCol)), lit(0L))))
        case _ => None
      }
    case _ => None
  }

  // ---------------------------------------------------------- replacement

  /** The matview read at the version matching the query's source pin,
    * re-shaped per the mapping and projected onto the original output
    * attributes (ids preserved). None on any type mismatch — e.g. a
    * refolded decimal sum that widened precision again.
    */
  private def replacement(spark: SparkSession, m: MaterializedAgg, aggV: Long,
      agg: Aggregate, mapping: (Seq[String], Seq[OutCol])): Option[LogicalPlan] = {
    val (groupNames, outs) = mapping
    val mvDf = m.sink.readAt(spark, aggV, DeleteMode.Hard)
    val refolds = outs.zipWithIndex.collect {
      case (RefoldOut(c), i) => c.as(s"__mv_o$i")
    }
    val computed = outs.zipWithIndex.collect {
      case (ComputedOut(c), i) => c.as(s"__mv_o$i")
    }
    val outNames = outs.zipWithIndex.map {
      case (GroupOut(n), _)    => n
      case (DirectOut(n), _)   => n
      case (ComputedOut(_), i) => s"__mv_o$i"
      case (RefoldOut(_), i)   => s"__mv_o$i"
    }
    val mv: LogicalPlan =
      if (refolds.nonEmpty)
        mvDf.groupBy(groupNames.map(col): _*).agg(refolds.head, refolds.tail: _*)
          .queryExecution.analyzed
      else if (computed.nonEmpty) {
        // exact grouping with derived outputs (avg): project them alongside
        // the pass-through view columns
        val named = outs.collect {
          case GroupOut(n)  => n
          case DirectOut(n) => n
        }.distinct
        mvDf.select(named.map(col) ++ computed: _*).queryExecution.analyzed
      } else if (groupNames.size < m.groupCols.size) {
        // group-cols-only subset: distinct groups, as an explicit Aggregate
        // (a .distinct() Deduplicate node would arrive after the optimizer
        // batch that lowers it to an aggregate has already run)
        val mvPlan = mvDf.queryExecution.analyzed
        val groupAttrs: Seq[NamedExpression] =
          groupNames.map(n => mvPlan.output.find(_.name == n).getOrElse(return None))
        Aggregate(groupAttrs, groupAttrs, mvPlan)
      } else mvDf.queryExecution.analyzed // exact: the view rows ARE the answer
    val byName: Map[String, Attribute] = mv.output.map(a => a.name -> a).toMap
    val projList = agg.output.zip(outNames).map { case (o, n) =>
      val src = byName.getOrElse(n, return None)
      if (src.dataType != o.dataType) return None
      // parquet reads back nullable; where the original output was not
      // (count, grouping keys), re-assert it so parents keep their plan
      val e: Expression =
        if (o.nullable || !src.nullable) src else KnownNotNull(src)
      Alias(e, o.name)(exprId = o.exprId): NamedExpression
    }
    Some(Project(projList, mv))
  }
}
