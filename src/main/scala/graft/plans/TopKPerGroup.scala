package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension surface (SURVEY.md §2 `expression_custom_note`,
  * ladder step (c)): a custom logical node + planner strategy + physical
  * operator for per-group top-k, registered through the PUBLIC
  * `spark.experimental.extraStrategies` hook (and injectable via
  * `SparkSessionExtensions.injectPlannerStrategy` for cluster-wide
  * deployment).
  *
  * Why a native operator: the declarative formulation —
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — sorts every
  * group's FULL row set (WindowExec requires a partition-local sort of all
  * rows) before discarding all but k. This operator keeps a bounded heap of
  * k rows per group instead: O(n log k) comparisons, O(groups·k) memory,
  * no sort buffer, no spill pressure — at 100 TB the difference between
  * "sort 100 TB inside each partition" and "stream it past fixed-size
  * heaps". The exchange on the group keys is still Catalyst's: the node
  * declares `ClusteredDistribution`, so AQE plans/coalesces the shuffle
  * exactly as it would for an aggregate.
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Co-locate each group on one partition; Catalyst inserts (and AQE
    * tunes) the exchange, exactly as for a hash aggregate. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groups = groupExprs
    val sortOrder = order
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groups, childOutput)
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(sortOrder, childOutput)
      // max-heap of the k currently-best rows per key: peek() is the worst
      // kept row; a new row enters only if it beats it
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reverse = ordering.reverse
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](limit, reverse)
          heaps.put(key.copy(), pq)
        }
        if (pq.size() < limit) pq.add(row.copy())
        else if (ordering.compare(row, pq.peek()) < 0) {
          pq.poll(); pq.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { pq =>
        pq.asScala.toArray.sorted(ordering).iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** User entry point. `orderCols` are (name, ascending) pairs; rows emit in
  * rank order within each group (group order across keys is unspecified —
  * follow with an `orderBy` for presentation, as with any aggregate). */
object TopK {
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed))
  }

  /** Idempotent strategy registration through the public experimental
    * hook; `GraftExtensions` also injects it for config-driven sessions. */
  def ensureRegistered(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ TopKPerGroupStrategy
}
