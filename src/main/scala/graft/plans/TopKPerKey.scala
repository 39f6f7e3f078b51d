package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per key WITHOUT a sort.
  *
  * Spark plans "top-k per group" (rank window + filter) as
  * Exchange → full partition SORT → Window → Filter: every row in every
  * partition is sorted even though only k per key survive. This operator
  * keeps the same exchange but replaces sort+window+filter with one pass
  * maintaining a bounded heap per key — O(n log k) comparisons instead of
  * O(n log n), and memory bounded by keys·k rows instead of the partition
  * (nothing to spill). At 100 TB "top 5 documents per domain by quality"
  * is exactly this shape, and the partition sort is the bottleneck.
  *
  * The full custom-operator ladder, as SparkSessionExtensions wires it:
  * [[TopKPerKeyNode]] (logical) is planned by [[GraftStrategies]]
  * (injected via `injectPlannerStrategy`) into [[TopKPerKeyExec]]
  * (physical), whose `requiredChildDistribution` makes EnsureRequirements
  * insert the same hash exchange the window formulation pays — the sort
  * is the only thing removed. Results are bit-identical to the window
  * formulation whenever `ordering` is a total order (ties broken by a
  * unique column), which callers should always provide.
  */
case class TopKPerKeyNode(
    k: Int,
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keyExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  // same clustering the window formulation needs — rows of one key meet
  // in one partition; EnsureRequirements inserts the hash exchange
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyE = keyExprs
    val ordE = ordering
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyE, childOutput)
      // codegen'd comparator; compare(a, b) < 0 ⇔ a wins over b
      val ord = GenerateOrdering.generate(ordE, childOutput)
      // per-key max-heap of the current k: the WORST survivor is at the
      // head, so each losing row costs one comparison and no allocation
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case None =>
            val h = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < kLocal) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue()
              h.enqueue(row.copy())
            }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner strategy turning [[TopKPerKeyNode]] into [[TopKPerKeyExec]];
  * injected per session through `SparkSessionExtensions
  * .injectPlannerStrategy` (graft.ext.GraftExtensions). */
class GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, ord, child) =>
      TopKPerKeyExec(k, keys, ord, planLater(child)) :: Nil
    case _ => Nil
  }
}
