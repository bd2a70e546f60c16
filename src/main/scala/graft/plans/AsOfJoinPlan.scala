package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of (backward) join as a NATIVE whole-operator — the (c) tier of
  * SURVEY.md §7.3's custom-operator preference order: a logical node, a
  * planner strategy, and a physical operator registered through
  * `SparkSessionExtensions` (graft.functions.GraftExtensions).
  *
  * Semantics: for every left row, attach the payload of the LAST right row
  * in the same key group with `rightTime <= leftTime` (ties inclusive), or
  * nulls when none exists — identical to [[graft.operators.AsOf.asofJoin]],
  * which stays as the built-ins-only formulation (union-tag + running
  * `last(ignoreNulls)` window) and as the parity baseline.
  *
  * Why a physical operator earns its keep here:
  *  - The compositional form shuffles the UNION of both inputs and runs a
  *    running-last window per payload column over it. This operator
  *    shuffles each input once by key (exactly a sort-merge join's
  *    requirement, satisfied by EnsureRequirements) and then does ONE
  *    streaming merge pass per partition with O(1) state — no union
  *    materialization, no per-column window, left rows never re-sorted
  *    with right rows.
  *  - Distribution/ordering are DECLARED (`requiredChildDistribution` /
  *    `requiredChildOrdering`), so Catalyst/AQE place the exchanges, reuse
  *    compatible ones, and can skew-split them like any keyed shuffle.
  *
  * Scale: state per partition is one buffered right row + one buffered
  * match payload — independent of key-group size, so a 100 TB fact as-of
  * a 10 TB quote stream is one co-partitioned shuffle each plus a linear
  * merge. Null keys GROUP (a null-key left row matches null-key right
  * rows) — the same behavior as the window formulation's partitionBy,
  * unlike SQL ASOF equality; a null right time sorts first and so matches
  * any left time. Keep keys and times non-null by contract where SQL
  * semantics matter.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute])
    extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equi-key on each side")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. Injected via
  * `injectPlannerStrategy` in GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.payload, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Streaming merge as-of join. Children are hash-clustered by key and
  * sorted by (key, time) — both placed by EnsureRequirements, not by this
  * operator — so each partition is a single forward pass over both sides. */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through in their sorted order, one output per input
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadExprs = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ payloadExprs)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val nullPayload =
        InternalRow.fromSeq(Seq.fill[Any](payloadExprs.length)(null))
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // one buffered right row (copied — the child iterator reuses its
        // row object) + the last matching payload for the current key:
        // O(1) state regardless of key-group size
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        private var rRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchPayload: UnsafeRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next().copy()
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeProj(rRow).copy()
          } else { rRow = null; rKey = null; rTime = null }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeProj(lRow)
          var scanning = true
          while (scanning && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) advanceRight() // right key group already passed
            else if (c == 0 && timeOrd.compare(rTime, lTime) <= 0) {
              // candidate: same key, not after left time; later right rows
              // in the group can only be better (times ascend), keep last
              matchKey = rKey
              matchPayload = payloadProj(rRow).copy()
              advanceRight()
            } else scanning = false // right is ahead of this left row
          }
          val p =
            if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0)
              matchPayload
            else nullPayload
          outProj(joined(lRow, p))
        }
      }
    }
  }
}
