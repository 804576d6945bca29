package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a FIRST-CLASS physical operator: custom `LogicalPlan`
  * node → `SparkStrategy` → `SparkPlan`, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` — the (c) extension
  * tier of the engine (whole-operator semantics that deserve their own
  * physical algorithm, not a composition).
  *
  * Semantics: backward as-of — every left row picks the LATEST right
  * row with the same key and `rightTime <= leftTime` (ties at equal
  * timestamps match), null-padding when none exists. Identical to the
  * union+tagged-window formulation in
  * [[graft.ops.TemporalJoins.asOfJoin]] (backward direction), which is
  * the property the spec and the shared DuckDB `ASOF LEFT JOIN` oracle
  * pin down.
  *
  * Why a custom exec: the composed form materializes a combined
  * (L ∪ R) sort and a window pass whose state is the last-observation
  * struct. This operator instead declares
  * `requiredChildDistribution = ClusteredDistribution(key)` and
  * `requiredChildOrdering = (key, time)` — EnsureRequirements
  * co-partitions BOTH sides (reusing an existing layout when a child
  * is already hash-partitioned, e.g. bucketed tables: the sort-merge
  * join contract) — and then streams each partition pair with one
  * two-pointer merge: O(|L| + |R|) per partition, ONE retained right
  * row of state, no union materialization, no window buffering. At
  * 100 TB that means the probe side never rewrites the build side's
  * rows through a window operator, and pre-bucketed fact/quote tables
  * as-of join with zero exchanges.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightValues: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]; injected via
  * `GraftExtensions`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

/** Partition-local sort-merge as-of join (see [[AsOfJoinNode]] for the
  * contract). Children arrive clustered by key and sorted by
  * (key, time); the merge keeps exactly one candidate right row — the
  * latest one at or before the current left row's time for the current
  * key — so per-partition state is O(1).
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val leftOut = left.output
    val rightOut = right.output
    // nullability-widened on BOTH the projected attrs and the input
    // schema they bind against — BindReferences takes nullability from
    // the input side, and a non-nullable binding writes 0, not null,
    // for unmatched rows
    val outAttrs = leftOut ++ rightValues.map(_.withNullability(true))
    val inAttrs = leftOut ++ rightOut.map(_.withNullability(true))
    val numRightCols = rightOut.length

    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // upcast to Expression: bindReference[A] casts its result back
      // to A, and a BoundReference is not an Attribute
      val lk = BindReferences.bindReference(
        leftKey: org.apache.spark.sql.catalyst.expressions.Expression,
        leftOut)
      val lt = BindReferences.bindReference(
        leftTime: org.apache.spark.sql.catalyst.expressions.Expression,
        leftOut)
      val rk = BindReferences.bindReference(
        rightKey: org.apache.spark.sql.catalyst.expressions.Expression,
        rightOut)
      val rt = BindReferences.bindReference(
        rightTime: org.apache.spark.sql.catalyst.expressions.Expression,
        rightOut)
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(numRightCols)

      new Iterator[InternalRow] {
        // lookahead right row (copied: the child iterator reuses its
        // row object) and the current candidate match
        private var nextR: InternalRow = fetchR()
        private var cand: InternalRow = null
        private var candKey: Any = null

        private def fetchR(): InternalRow = {
          while (ri.hasNext) {
            val r = ri.next()
            if (rk.eval(r) != null && rt.eval(r) != null) return r.copy()
          }
          null
        }

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          val k = lk.eval(l)
          val t = lt.eval(l)
          if (k == null || t == null)
            return proj(joined(l, nullRight))
          // a candidate from an earlier key is dead once the left key
          // moves on (both sides ascend by key)
          if (cand != null && keyOrd.compare(
              candKey.asInstanceOf[AnyRef],
              k.asInstanceOf[AnyRef]) != 0) {
            cand = null; candKey = null
          }
          var advance = true
          while (advance && nextR != null) {
            val nk = rk.eval(nextR)
            val c = keyOrd.compare(nk.asInstanceOf[AnyRef],
              k.asInstanceOf[AnyRef])
            if (c < 0) {
              nextR = fetchR() // earlier key: can never match again
            } else if (c == 0 && timeOrd.compare(
                rt.eval(nextR).asInstanceOf[AnyRef],
                t.asInstanceOf[AnyRef]) <= 0) {
              cand = nextR; candKey = nk // latest-so-far at or before t
              nextR = fetchR()
            } else {
              advance = false // same key later time, or a later key
            }
          }
          proj(joined(l, if (cand != null) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
