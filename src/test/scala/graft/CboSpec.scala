package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CBO stats-path pin (VERDICT r7 missing #5): the 100×-scale story leans
  * on table/column statistics existing — AQE re-plans at runtime, but only
  * collected stats let the optimizer pick a join ORDER before any stage
  * runs. This spec exercises the full path: saveAsTable → ANALYZE TABLE
  * (table + column stats) → catalog row counts visible to the logical
  * planner → `CostBasedJoinReorder` effectively rewriting a deliberately
  * badly-ordered star join.
  */
class CboSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  test("ANALYZE TABLE feeds CBO: stats visible and CostBasedJoinReorder fires") {
    val sfx = (sf.hashCode & Int.MaxValue).toString
    val li = s"graft_cbo_li_$sfx"
    val ord = s"graft_cbo_ord_$sfx"
    val cust = s"graft_cbo_cust_$sfx"
    T.staged("cbo_tables", sf) { _ =>
      Seq(li, ord, cust).foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      T.t(s, sf, "lineitem").select("l_orderkey", "l_quantity")
        .write.saveAsTable(li)
      T.t(s, sf, "orders").select("o_orderkey", "o_custkey")
        .write.saveAsTable(ord)
      T.t(s, sf, "customer").select("c_custkey", "c_mktsegment")
        .write.saveAsTable(cust)
      Seq(li, ord, cust).foreach(t =>
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
    }
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // catalog row count reaches the logical planner
      val liCount = T.t(s, sf, "lineitem").count()
      val statRc = s.table(li).queryExecution.optimizedPlan.stats.rowCount
      assert(statRc.contains(BigInt(liCount)), s"rowCount=$statRc want=$liCount")
      // written order joins the two FACT tables first; with stats the
      // reorderer must move the selective customer dim ahead of lineitem
      val df = s.sql(
        s"""SELECT count(*) AS n
           |FROM $li l
           |JOIN $ord o ON l.l_orderkey = o.o_orderkey
           |JOIN $cust c ON o.o_custkey = c.c_custkey
           |WHERE c.c_mktsegment = 'BUILDING'""".stripMargin)
      df.collect()
      val rule = "org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder"
      val summary = df.queryExecution.tracker.rules.get(rule)
      assert(summary.exists(_.numEffectiveInvocations > 0),
        s"CostBasedJoinReorder never changed the plan: $summary")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
