package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeSet, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning through [[AsOfJoinPlan]].
  *
  * Catalyst's built-in `ColumnPruning` cannot see inside custom logical
  * nodes, so `SELECT two_cols FROM asof_join(wide_left, wide_right)` would
  * shuffle and sort EVERY column of both sides. This rule pushes a Project
  * into each child keeping only what the outer projection references plus
  * what the operator itself needs (keys, timestamps, tie-breaks) — at wide
  * schemas that is the difference between shuffling two columns and
  * shuffling the whole table. Idempotent: once children are pruned the
  * guard finds nothing more to drop.
  */
object AsOfColumnPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(plist, j: AsOfJoinPlan) =>
      val needed = AttributeSet(plist.flatMap(_.references)) ++
        AttributeSet(j.leftKeys.flatMap(_.references)) ++
        AttributeSet(j.rightKeys.flatMap(_.references)) ++
        j.leftTs.references ++ j.rightTs.references ++
        AttributeSet(j.rightTie.flatMap(_.references))
      val lKeep = j.left.output.filter(needed.contains)
      val rKeep = j.right.output.filter(needed.contains)
      if (lKeep.length == j.left.output.length && rKeep.length == j.right.output.length) p
      else Project(plist, j.copy(
        left = Project(lKeep.map(_.asInstanceOf[NamedExpression]), j.left),
        right = Project(rKeep.map(_.asInstanceOf[NamedExpression]), j.right)))
  }
}
