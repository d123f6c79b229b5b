package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom plan — preference (c) of the extension
  * ladder (SURVEY §2.11): a native backward as-of join as a logical
  * node + planner strategy + physical merge-scan exec, registered via
  * `SparkSessionExtensions` (GraftExtensions).
  *
  * Where `operators.Joins.asofBackward` composes union+window (one
  * shuffle, but it materializes a running `last(ignoreNulls)` window
  * over the combined stream), this operator asks the planner for
  * co-partitioned, (key, time)-sorted children — the SAME distribution
  * contract SortMergeJoin uses, so Catalyst inserts (and can later
  * REUSE) the exchanges — and then streams both sorted iterators once
  * per partition with O(1) state: the last matching right payload.
  * No window buffer, no row tagging, no post-filter.
  */

/** Logical node: left rows + the payload of the latest right row with
  * `right.time <= left.time` on the same key (null payload when no
  * such row). Constructed from ANALYZED child plans, so it enters the
  * planner already resolved.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[NamedExpression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: lower the logical node 1:1 onto the physical
  * exec. Injected with `injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKey, n.rightKey, n.leftTime, n.rightTime,
        n.rightPayload, n.output, planLater(n.left),
        planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Physical merge-scan as-of join.
  *
  * Contract with the planner: both children clustered on the key
  * (`ClusteredDistribution` — EnsureRequirements co-partitions them
  * exactly as for a shuffled join) and sorted by (key, time)
  * ascending. `doExecute` then zips partitions and walks both sorted
  * iterators once: the right cursor advances while `r.key < l.key or
  * (r.key == l.key and r.time <= l.time)`, retaining only the last
  * in-key payload — O(left + right) per partition, O(1) state.
  *
  * Keys and times must be 64-bit-backed types (long / timestamp);
  * NULL keys or times never match (ASOF semantics).
  */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[NamedExpression], output: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // left rows pass through 1:1 — the left child's sort survives
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  // ...and so does its partitioning (same claim SortMergeJoin makes):
  // without this the node reports UnknownPartitioning and a
  // downstream groupBy/join on the SAME key re-shuffles data that
  // EnsureRequirements already clustered — forfeiting the exchange
  // reuse this operator exists for
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val payload = rightPayload
    val lOut = left.output
    val rOut = right.output
    val out = output
    val lKey = leftKey; val lTime = leftTime
    val rKey = rightKey; val rTime = rightTime
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lExtract = UnsafeProjection.create(Seq(lKey, lTime), lOut)
      val rExtract = UnsafeProjection.create(Seq(rKey, rTime), rOut)
      val rProj = UnsafeProjection.create(payload, rOut)
      // payload slots are null for unmatched rows — bind them as
      // NULLABLE or the generated projection skips the null check and
      // reads garbage zeros
      val outProj = UnsafeProjection.create(out,
        lOut ++ payload.map(_.toAttribute.withNullability(true)))
      val nullPayload = new GenericInternalRow(payload.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rK = 0L; private var rT = 0L
        private var rValid = false
        private var lastKey = 0L
        private var lastPayload: UnsafeRow = _
        private var hasLast = false

        private def advanceRight(): Unit = {
          rValid = false
          while (!rValid && rIt.hasNext) {
            rRow = rIt.next()
            val kt = rExtract(rRow)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              rK = kt.getLong(0); rT = kt.getLong(1); rValid = true
            } // null key/time right rows can never match — skip
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val kt = lExtract(l)
          if (kt.isNullAt(0) || kt.isNullAt(1))
            return outProj(joined(l, nullPayload))
          val lk = kt.getLong(0); val lt = kt.getLong(1)
          while (rValid && (rK < lk || (rK == lk && rT <= lt))) {
            if (rK == lk) {
              // retained beyond this call — copy out of the iterator's
              // reused buffer
              lastPayload = rProj(rRow).copy()
              lastKey = lk; hasLast = true
            }
            advanceRight()
          }
          val p: InternalRow =
            if (hasLast && lastKey == lk) lastPayload else nullPayload
          outProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
