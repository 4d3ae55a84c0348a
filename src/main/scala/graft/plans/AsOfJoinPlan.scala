package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A native as-of join operator — the full custom-operator stack
  * (LogicalPlan -> Strategy -> SparkPlan) for a primitive Spark SQL lacks.
  *
  * Semantics: for every left row, the greatest `rightTime` with
  * `rightKey == leftKey` and `rightTime <= leftTime`, appended as one
  * nullable output column.
  *
  * Physical execution is a partition-local two-pointer merge over the two
  * children, which EnsureRequirements co-partitions (ClusteredDistribution
  * on the keys) and sorts by (key, time). Per partition the scan is
  * O(|L| + |R|) with O(1) state — no join explosion, no window buffer; hot
  * keys cost a sort, never a cross product. This is the plan shape a
  * hand-written sort-merge as-of join produces in native engines.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    outAttr: AttributeReference,
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr :: Nil)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, attr) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, attr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    outAttr: Attribute,
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lk = BindReferences.bindReference(leftKey, lOut)
    val lt = BindReferences.bindReference(leftTime, lOut)
    val rk = BindReferences.bindReference(rightKey, rOut)
    val rt = BindReferences.bindReference(rightTime, rOut)
    val outSchema = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val rBuf = rIt.buffered
      val matchRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outSchema, lOut :+ outAttr)

      // Running state: the key whose rows the right pointer last consumed,
      // and the greatest consumed time for that key.
      var curKey: Any = null
      var lastTime: Any = null

      lIt.map { lrow =>
        val k = lk.eval(lrow)
        var matched: Any = null
        // null left keys or times never match (SQL comparison semantics);
        // interpreted orderings NPE on null operands, so both sides skip
        // null times explicitly rather than feeding them to the comparator.
        val t = if (k == null) null else lt.eval(lrow)
        if (k != null && t != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val rrow = rBuf.head
            val rkv = rk.eval(rrow)
            // null right keys sort first under the required ordering; they
            // can never match, so consume and move on
            val cmp = if (rkv == null) -1 else keyOrd.compare(rkv.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
            if (cmp < 0) {
              rBuf.next()
              curKey = rkv
              lastTime = null
            } else if (cmp == 0) {
              val rtv = rt.eval(rrow)
              if (rtv == null) {
                // null times sort first within the key (Ascending = nulls
                // first): consume without recording a match time
                rBuf.next()
                curKey = rkv
                lastTime = null
              } else if (timeOrd.compare(rtv.asInstanceOf[AnyRef], t.asInstanceOf[AnyRef]) <= 0) {
                lastTime = rtv
                curKey = rkv
                rBuf.next()
              } else {
                advance = false
              }
            } else {
              advance = false
            }
          }
          if (curKey != null && keyOrd.compare(curKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0) {
            matched = lastTime
          }
        }
        matchRow.update(0, matched)
        project(joined(lrow, matchRow))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}
