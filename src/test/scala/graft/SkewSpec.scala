package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew-join splitting (SURVEY §8 fact-fact join row):
  * join_skew_salted shows DETERMINISTIC salting; this pins the RUNTIME
  * alternative — AQE detects an oversized partition at the shuffle
  * boundary and splits it without any query rewrite.
  */
class SkewSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds in COMPRESSED shuffle bytes
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // hot key 0: ~100k rows on the left, every other key tiny
      val left = s.range(0, 100000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = s.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      // aggregate v too, so column pruning keeps the payload in the
      // shuffle and partition sizes reflect real row widths
      val joined = left.join(right, "k")
        .groupBy().agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      // collect() (not head()) so THIS Dataset's AQE plan executes and
      // finalizes — head() plans a separate limited query
      val n = joined.collect()(0).getLong(0)
      // hot key 0 matches right k=0: 50k rows; the 500 odd ids < 1000 match 1:1
      assert(n == 50000 + 500, s"join produced $n rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally old.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
