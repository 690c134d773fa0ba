package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BoundReference, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The full custom-operator stack for the as-of join, demonstrating path
  * (c) of the extension ladder: a [[LogicalPlan]] node, a planner
  * [[Strategy]], and a physical [[SparkPlan]] executing a per-partition
  * MERGE — the plan shape a native engine would pick for ASOF.
  *
  * Compare `operators/AsOfJoin.latestPrior` (the union+window composition,
  * also one shuffle): the merge operator needs no union row-widening, no
  * window buffer, and streams both sorted inputs with O(1) state per
  * partition (the latest prior right row). Same result, oracle-checked
  * against DuckDB's native ASOF JOIN via q36.
  *
  * Planning: `requiredChildDistribution` clusters both children on the join
  * key and `requiredChildOrdering` asks for (key, ts) ascending — Catalyst's
  * EnsureRequirements inserts the hash exchanges and sorts exactly as it
  * would for a SortMergeJoin, AQE included; the operator itself only merges.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression)
  extends BinaryNode {

  // right side is outer: nulls when a left row has no prior right row
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinNode → AsOfJoinExec. Installed per-session via
  * `spark.experimental.extraStrategies` (see `AsOfJoin.latestPriorMerge`)
  * or globally via `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge. Children arrive hash-clustered on the key and
  * sorted by (key asc, ts asc) — this node zips co-partitioned inputs and
  * carries the latest prior right row forward in a single forward pass.
  *
  * Semantics: for each left row, the right row of the same key with the
  * greatest `ts <= left.ts` (inclusive), else nulls. A null left key never
  * matches (equi-join semantics). Right `ts` must be non-null (matches the
  * composition's ordering assumption; aggregate the right side first).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression)
  extends BinaryExecNode {

  // the merge reads right-key slots through an ordering generated from the
  // LEFT key type and both ts slots as long — enforce rather than corrupt
  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types must match: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTs.dataType == org.apache.spark.sql.types.LongType &&
    rightTs.dataType == org.apache.spark.sql.types.LongType,
    s"as-of ts expressions must be LongType (cast first): ${leftTs.dataType}/${rightTs.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = this.left.output
    val rightOut = this.right.output
    val lKeyExpr = leftKey; val lTsExpr = leftTs
    val rKeyExpr = rightKey; val rTsExpr = rightTs
    val resultExprs = output
    // serializable; generates the comparator lazily on the executor
    val keyOrd = new LazilyGeneratedOrdering(
      Seq(SortOrder(BoundReference(0, leftKey.dataType, nullable = true), Ascending)))

    this.left.execute().zipPartitions(this.right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), leftOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rightOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val resultProj = UnsafeProjection.create(resultExprs, resultExprs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)

      var rHead: InternalRow = null
      def advanceRight(): Unit =
        rHead = if (rIter.hasNext) rIter.next().copy() else null
      advanceRight()

      var lastPrior: InternalRow = null
      var lastPriorKey: UnsafeRow = null

      lIter.map { l =>
        val lKeyRow = lKeyProj(l)
        if (lKeyRow.isNullAt(0)) {
          resultProj(joined(l, nullRight))
        } else {
          val lTsRow = lTsProj(l)
          val lTs = if (lTsRow.isNullAt(0)) Long.MinValue else lTsRow.getLong(0)
          // consume right rows at/before (lKey, lTs) in the shared
          // (key, ts) sort order; remember the last one and its key
          var continue = rHead != null
          while (continue) {
            val rKeyRow = rKeyProj(rHead)
            val c = keyOrd.compare(rKeyRow, lKeyRow)
            val take = c < 0 || (c == 0 && {
              val t = rTsProj(rHead)
              // null right ts sorts first => "earliest", same as the
              // union+window composition's NULLS FIRST ordering
              t.isNullAt(0) || t.getLong(0) <= lTs
            })
            if (take) {
              lastPrior = rHead
              lastPriorKey = rKeyRow.copy()
              advanceRight()
              continue = rHead != null
            } else continue = false
          }
          val matched = lastPrior != null && keyOrd.compare(lastPriorKey, lKeyRow) == 0
          resultProj(joined(l, if (matched) lastPrior else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
