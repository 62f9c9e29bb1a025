package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator global rank: append a 1-based dense position under a
  * TOTAL order, without a single-partition window and without a second
  * evaluation of the sorted child.
  *
  * Why a custom operator (preference (c) of the build rules): no
  * composition of built-ins expresses "rank the whole frame" safely at
  * corpus scale — `Window.orderBy` with no partition funnels everything
  * through ONE task, and the earlier two-branch declarative form (sort →
  * monotonic id; separate count branch → broadcast prefix sum) was only
  * correct while the optimizer REUSED the range exchange between the
  * branches: each branch's RangePartitioner samples boundaries with an
  * rdd.id-derived seed, so under `spark.sql.exchange.reuse=false` the
  * branches saw different boundaries and ranks silently duplicated/gapped
  * (~188k unique over 200k rows, observed). Here consistency is
  * structural: `doExecute` materializes the range-partitioned sorted
  * child ONCE, takes per-partition sizes with one lightweight job over
  * that same RDD (`RDD.zipWithIndex`'s technique — the count pass and the
  * output pass share the one shuffle, so boundaries exist exactly once),
  * and streams each partition with its prefix-summed offset. Constructing
  * the frame launches nothing; the count job runs at action time.
  *
  * Scale: the sort is Spark's ordinary distributed range sort; the extra
  * cost is one count job over already-shuffled data and a
  * numPartitions-sized driver array — bounded by cluster topology, never
  * data size.
  */
case class GlobalRankPlan(order: Seq[SortOrder], rankAttr: Attribute,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankPlan =
    copy(child = newChild)
}

case class GlobalRankExec(order: Seq[SortOrder], rankAttr: Attribute,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = order :: Nil
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    // ONE child RDD: the count job and the output rows share its single
    // range-shuffle, so partition boundaries are sampled exactly once —
    // the structural invariant the two-branch form lacked
    val rdd = child.execute()
    val counts = rdd.mapPartitions(
      it => Iterator.single(it.size.toLong), preservesPartitioning = true)
      .collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val outTypes = output.map(_.dataType).toArray
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(outTypes)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var rank = offsets(pid)
      it.map { row =>
        rank += 1L
        rankRow.update(0, rank)
        proj(joined(row, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}

/** Planner strategy for [[GlobalRankPlan]]. Registered two ways: via
  * [[graft.GraftExtensions]] for sessions configured with the extension,
  * and idempotently through `spark.experimental.extraStrategies` by
  * [[graft.Search.globalRank]] itself — so the operator works on ANY
  * session it is actually used from. */
object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankPlan(order, rankAttr, child) =>
      GlobalRankExec(order, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}
