package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join (ladder step (c), the TopKPerGroup pattern —
  * SURVEY.md §2 `expression_custom_note`): for every left row, the LAST
  * right row with the same key and right-ts ≤ left-ts (left-outer; ties on
  * equal right-ts resolved by the caller-supplied tie-break ordering, last
  * wins).
  *
  * Why a native operator: the declarative formulation unions both sides and
  * runs a running-max window over the MIXED stream — one shuffle + one
  * partition-local sort of left+right TOGETHER, and the window carries the
  * right payload through every left row. This operator instead declares
  * `ClusteredDistribution` on each side and per-side (key, ts) orderings,
  * so Catalyst/AQE plan two independent exchanges + sorts (each side sorts
  * ALONE — at 100 TB the probe side is usually orders of magnitude larger
  * than the quote side), and the merge itself is one forward sweep with
  * O(1) state per partition: no window buffer, no mixed-stream sort, no
  * spill pressure.
  */
case class AsOfJoinPlan(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Seq[Expression],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lts, rts, tie, l, r) =>
      AsOfJoinExec(lk, rk, lts, rts, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on their keys; EnsureRequirements co-partitions the
    * two exchanges (the shuffled-join contract) and AQE tunes them. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Per-side merge order: (keys, ts) left; (keys, ts, tie) right — the
    * tie-break makes "last right row ≤ ts" deterministic under equal
    * timestamps. Catalyst inserts the SortExecs. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightTie)).map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTs = leftTs; val rTs = rightTs
    val lOut = left.output; val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lit, rit) =>
      // three DISTINCT projections per side-role so compared buffers never
      // alias; the natural orderings match the required child sorts
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(lTs.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      var lookahead: InternalRow = if (rit.hasNext) rit.next().copy() else null
      var cand: InternalRow = null
      lit.map { l =>
        val lk = lKeyProj(l)
        val lt = lTsProj(l)
        // consume right rows that are usable for this (and so for every
        // later) left row: key strictly behind, or same key with ts ≤ lt.
        // The forward-only cursor is what makes the merge O(n+m).
        var advancing = true
        while (advancing && lookahead != null) {
          val kc = keyOrd.compare(rKeyProj(lookahead), lk)
          if (kc < 0 || (kc == 0 && tsOrd.compare(rTsProj(lookahead), lt) <= 0)) {
            cand = lookahead
            lookahead = if (rit.hasNext) rit.next().copy() else null
          } else advancing = false
        }
        val matched = cand != null && keyOrd.compare(rKeyProj(cand), lk) == 0
        joined(l, if (matched) cand else nullRight)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User entry point. Key/ts columns are named per side; `rightTieCols`
  * break equal-timestamp ties (last in (ts, tie) order wins). The right
  * side's columns must not collide with the left's — alias them first
  * (which also gives a self-join fresh expression ids). */
object AsOf {
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTs: String, rightTs: String,
      rightTieCols: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val la = left.queryExecution.analyzed
    val ra = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute = p.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      leftKeys.map(attr(la, _)), rightKeys.map(attr(ra, _)),
      attr(la, leftTs), attr(ra, rightTs),
      rightTieCols.map(attr(ra, _)), la, ra))
  }

  def ensureRegistered(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
}
