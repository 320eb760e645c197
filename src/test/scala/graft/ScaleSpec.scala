package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guards for the round-6 §2-R group (GroupScale) beyond the
  * DuckDB oracle gate: invariants that must hold at ANY scale, checked on
  * sf0.001.
  */
class ScaleSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf
  private def run(key: String) = SparkEntry.queries(key)(s, sf)

  test("agg_countmin_heavy_hitters: CMS estimates only over-count") {
    val rows = run("agg_countmin_heavy_hitters").collect()
    assert(rows.length == 20)
    assert(rows.forall(r => r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt")),
      "count-min must never under-estimate")
  }

  test("join_asof_nearest: distances non-negative, nearest side truly nearer") {
    val rows = run("join_asof_nearest").collect()
    assert(rows.nonEmpty)
    assert(rows.filter(!_.isNullAt(4)).forall(_.getAs[Long]("dist_s") >= 0))
  }

  test("etl_cdc_apply: deleted keys absent, one row per surviving key") {
    val res = run("etl_cdc_apply")
    assert(res.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
  }

  test("etl_snapshot_diff: classes partition the union of snapshot keys") {
    val byClass = run("etl_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_keys")).toMap
    val totalB = T.t(s, sf, "orders")
      .filter(year(col("o_orderdate")) <= 1996)
      .select("o_custkey").distinct().count()
    // orders only accumulate: nothing is ever removed
    assert(byClass.getOrElse("removed", 0L) == 0L)
    assert(byClass.values.sum == totalB, s"$byClass vs $totalB")
  }

  test("etl_surrogate_key: keys globally unique") {
    assert(run("etl_surrogate_key").filter(col("dup_cnt") =!= 1).count() == 0)
  }

  test("dq_profile_columns: count invariants hold per column") {
    val rows = run("dq_profile_columns").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nonnull") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_nonnull"))
    }
  }

  test("agg_argmax_by: returned key really carries the max price") {
    val orders = T.t(s, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice").cast(T.dec).cast("double").as("p"))
    run("agg_argmax_by").collect().foreach { r =>
      val price = orders.filter(col("o_orderkey") === r.getAs[Long]("top_orderkey"))
        .collect().head.getAs[Double]("p")
      assert(price == r.getAs[Double]("top_price"),
        s"argmax key price $price != max $r")
    }
  }

  test("window_pattern_path: path length equals the user's event count") {
    val counts = T.t(s, sf, "events").groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    run("window_pattern_path").collect().foreach { r =>
      val n = r.getAs[String]("path").split(">").length.toLong
      assert(n == counts(r.getAs[Long]("user_id")))
    }
  }

  test("ts_resample_interpolate: every spine day filled, interior values bounded") {
    val res = run("ts_resample_interpolate").collect()
    assert(res.nonEmpty && res.length % 30 == 0, s"30 days per user, got ${res.length}")
    assert(res.forall(!_.isNullAt(2)), "no unfilled day may remain")
  }
}
