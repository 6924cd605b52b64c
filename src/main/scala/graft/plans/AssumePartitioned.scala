package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Partitioning-metadata re-assertion for the checkpointed frames of
  * the carry machinery (`ops.PrefixSum`).
  *
  * `localCheckpoint` truncates lineage to a `LogicalRDD` whose
  * partitioning is `UnknownPartitioning` (under AQE the final physical
  * partitioning cannot be captured), so every downstream operator that
  * needs a clustered distribution — the per-physical-partition window,
  * the carry aggregate — re-exchanges the FULL data even though the
  * checkpointed RDD is already partitioned exactly as required: the
  * frame was built as `repartitionByRange(...).withColumn("__pid",
  * spark_partition_id())`, so partition i holds precisely the rows
  * with `__pid = i` — i.e. the RDD IS range-partitioned by `__pid`,
  * ascending, one pid per partition.
  *
  * This node re-asserts that (true) property: a pass-through exec whose
  * `outputPartitioning` is `RangePartitioning(__pid ASC, n)`. A window
  * partitioned by (`__pid`, k…) or an aggregate keyed by (`__pid`, k…)
  * is then satisfied without an exchange (range ordering expressions
  * {__pid} ⊆ clustering keys), which removes the second full-data
  * exchange each PrefixSum call used to pay. `RangePartitioning` is
  * chosen over `HashPartitioning` deliberately: it is the claim that is
  * literally true of the RDD layout, and it can never be mistaken for a
  * hash-co-partitioned join side (range partitionings do not
  * participate in co-partitioned joins), so the assertion cannot leak
  * a false co-location assumption outside PrefixSum.
  *
  * Correctness containment: the node is only constructed by
  * `ops.PrefixSum` directly on top of its own checkpoint, where the
  * partition-to-pid bijection holds by construction.
  */
case class AssumePidRangePartitionedNode(
    pid: Attribute, numParts: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): AssumePidRangePartitionedNode =
    copy(child = newChild)
}

case class AssumePartitionedExec(
    pid: Attribute, numParts: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning =
    RangePartitioning(Seq(SortOrder(pid, Ascending)), numParts)
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def doExecute(): RDD[InternalRow] = child.execute()
  override def supportsColumnar: Boolean = child.supportsColumnar
  override def doExecuteColumnar(): RDD[org.apache.spark.sql.vectorized.ColumnarBatch] =
    child.executeColumnar()
  override protected def withNewChildInternal(
      newChild: SparkPlan): AssumePartitionedExec =
    copy(child = newChild)
}

object AssumePartitionedStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AssumePidRangePartitionedNode(pid, n, child) =>
      AssumePartitionedExec(pid, n, planLater(child)) :: Nil
    case _ => Nil
  }
}
