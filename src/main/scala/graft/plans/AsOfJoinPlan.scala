package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Full custom-operator path (LogicalPlan → Strategy → SparkPlan) for the
  * as-of join — the demonstration of extending Spark's planner where an
  * operator has no primitive (SURVEY §2 row 26b; the composed union+window
  * form in [[graft.operators.TemporalJoins.asOfJoin]] is the (a)-path twin
  * and the correctness reference for this implementation).
  *
  * Physical algorithm: both sides hash-clustered on the key and sorted by
  * (key, ts); a single merge pass per partition keeps the latest right row
  * at-or-before the current left timestamp. No join node, no state beyond
  * one buffered right row per partition — the textbook sort-merge as-of.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute]
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute]
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))
  )

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val numValues = rightValues.length
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val rVals: Seq[Expression] = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTs), leftOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rightOutput)
      val rValProj = UnsafeProjection.create(rVals, rightOutput)
      // bind against nullable value attrs: unmatched left rows emit nulls
      val outProj = UnsafeProjection.create(outAttrs, leftOutput ++ rightValues.map(_.withNullability(true)))
      val keyOrdering =
        org.apache.spark.sql.catalyst.expressions.RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRow = new GenericInternalRow(numValues)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        private var lastKey: InternalRow = _
        private var lastVal: InternalRow = _
        private var lastTs: Long = Long.MinValue

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTsProj(l).getLong(0)
          // advance right cursor to the last row with key < lk, or key == lk && ts <= lt
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rKeyProj(head)
            val c = keyOrdering.compare(hk, lk)
            if (c < 0 || (c == 0 && rTsProj(head).getLong(0) <= lt)) {
              val row = rBuf.next()
              lastKey = rKeyProj(row).copy()
              lastVal = rValProj(row).copy()
              lastTs = rTsProj(row).getLong(0)
            } else advancing = false
          }
          val matched = lastKey != null &&
            keyOrdering.compare(lastKey, lk) == 0 && lastTs <= lt
          outProj(joined(l, if (matched) lastVal else nullRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, vals) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, vals) :: Nil
    case _ => Nil
  }
}
