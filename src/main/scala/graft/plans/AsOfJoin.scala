package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator (SURVEY R-custom; the one operator
  * family Spark lacks natively).
  *
  * Semantics: for every left row, attach the single right row with the same
  * key and the greatest `rightTs < leftTs` (strictly earlier); ties on
  * `rightTs` resolve by the greatest `tieBreak` value. Left rows with no
  * match keep nulls on the right (left-outer shape). Null keys and null
  * timestamps follow SQL equi-join semantics: a null key or null ts on
  * either side matches nothing (left rows still surface with null right).
  *
  * Why a custom plan: the compositional form (equi-join on key + range
  * predicate + max_by) materializes EVERY (left, earlier-right) pair before
  * aggregating — O(|L|·|R|) per key. This operator requires hash
  * co-partitioning on the key and (key, ts) ordering from its children —
  * Catalyst's EnsureRequirements inserts exactly one shuffle+sort per side —
  * then streams both sorted iterators with a two-pointer merge: O(|L|+|R|)
  * per partition, no pair blowup, no row buffering beyond one candidate.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Seq[Expression],
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tie, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie, tol) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Seq[Expression],
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  /** One hash shuffle per side (skipped when a child is already partitioned
    * compatibly) — the minimum any keyed join needs.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  /** Sort by (key, ts[, tie]) so the merge is a single forward pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTie)).map(SortOrder(_, Ascending)))

  /** The merge emits left rows in place, so the left child's hash
    * partitioning survives — declaring it lets a downstream aggregation or
    * join on the as-of key reuse the exchange instead of re-shuffling
    * (same contract SortMergeJoin declares for its streamed side).
    */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val tol = tolerance
    val allOut = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTsBound = BindReferences.bindReference(lTsExpr, lOut)
      val rTsBound = BindReferences.bindReference(rTsExpr, rOut)
      val outProj = UnsafeProjection.create(allOut, allOut)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        private var candidate: InternalRow = null
        private var candidateKey: UnsafeRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val ltsRaw = lTsBound.eval(l)
          // SQL equi-join semantics: a null key or null ts matches nothing.
          // Null-key rows sort first (NullsFirst), so returning before the
          // pointer advances cannot skip rows a later left row needs.
          if (lKey.anyNull || ltsRaw == null) {
            return outProj(joiner(l, nullRight))
          }
          val lts = ltsRaw.asInstanceOf[Long]
          // advance the right pointer through rows that are (a) on smaller
          // keys, (b) null-key/null-ts (unmatchable under equi-join rules),
          // or (c) on this key but strictly earlier than lts; the last such
          // row on this key is the as-of candidate (sorted by ts, tie).
          var advancing = true
          while (advancing && rRow != null) {
            val rKey = rKeyProj(rRow)
            val rtsRaw = if (rKey.anyNull) null else rTsBound.eval(rRow)
            if (rKey.anyNull || rtsRaw == null) {
              rRow = if (rIter.hasNext) rIter.next().copy() else null
            } else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) {
                rRow = if (rIter.hasNext) rIter.next().copy() else null
              } else if (c == 0 && rtsRaw.asInstanceOf[Long] < lts) {
                candidate = rRow
                candidateKey = rKey.copy()
                rRow = if (rIter.hasNext) rIter.next().copy() else null
              } else {
                advancing = false
              }
            }
          }
          // tolerance: a candidate older than the allowed gap is no match
          val matched = candidate != null && keyOrd.compare(candidateKey, lKey) == 0 &&
            tol.forall(t => lts - rTsBound.eval(candidate).asInstanceOf[Long] <= t)
          outProj(joiner(l, if (matched) candidate else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}
