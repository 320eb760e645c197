package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic guards for the round-5 analytics group (GroupAnalytics) beyond
  * the DuckDB oracle gate: invariants that must hold at ANY scale, checked
  * on sf0.001.
  */
class AnalyticsSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf
  private def run(key: String) = SparkEntry.queries(key)(s, sf)

  test("ml_kmeans_lloyd partitions every vector into exactly one cluster") {
    val total = graft.T.t(s, sf, "embeddings").count()
    val res = run("ml_kmeans_lloyd")
    assert(res.agg(sum("n")).head.getLong(0) == total)
    // deterministic init: 8 seed clusters exist at every fixture scale
    assert(res.count() <= 8 && res.count() > 0)
  }

  test("dedup_pipeline_audit funnel is monotone per source") {
    val bad = run("dedup_pipeline_audit")
      .filter(col("n_raw") < col("n_exact") || col("n_exact") < col("n_final"))
      .count()
    assert(bad == 0)
  }

  test("vector_pq_topk stages its index once and reuses it (index-as-artifact)") {
    val r1 = run("vector_pq_topk").collect()
    // the index must already be staged for this dataset: a second staged()
    // access for the same (tag, dir) must NOT invoke the writer again
    var reinvoked = false
    val d = T.staged("pq_index", sf) { _ => reinvoked = true }
    assert(!reinvoked, "pq_index writer ran twice for the same dataset")
    assert(new java.io.File(s"$d/cents").exists, "persisted codebook missing")
    assert(new java.io.File(s"$d/codes").exists, "persisted codes missing")
    // re-running the query reads the artifact and returns identical results
    val r2 = run("vector_pq_topk").collect()
    assert(r1.toSeq == r2.toSeq)
  }

  test("vector_quantized_topk sims bounded by int8 geometry") {
    // |dot| <= 64 * 127^2 for 64-dim int8 vectors; unit-norm inputs keep
    // the true value near <=127^2 but the hard bound must always hold
    val over = run("vector_quantized_topk")
      .filter(abs(col("sim")) > 64L * 127 * 127).count()
    assert(over == 0)
  }

  test("etl_compact_small_files actually reduces the file count") {
    run("etl_compact_small_files").collect() // force staging
    def parquetFiles(tag: String): Int = {
      val dir = graft.T.staged(tag, sf)(_ => fail(s"$tag should be staged"))
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    }
    val before = parquetFiles("frag")
    val after = parquetFiles("compact")
    assert(before == 64, s"fragmented stage had $before files")
    assert(after == 4, s"compacted stage had $after files")
  }

  test("etl_zorder_layout blocks are spatially local (tight x/y rectangles)") {
    // a 64-wide z block covers at most an 8x8 rectangle of (x, y) space
    val bad = run("etl_zorder_layout")
      .filter(col("max_x") - col("min_x") > 7 || col("max_y") - col("min_y") > 7)
      .count()
    assert(bad == 0)
  }

  test("join_interval_bucketed equals the naive range-join pair set") {
    val bucketed = run("join_interval_bucketed").select("p_id", "c_id")
    val ev = graft.T.t(s, sf, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("pu"), col("us").as("pus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"), col("us").as("cus"))
    val naive = p.join(c, col("pu") === col("cu") &&
        abs(col("cus") - col("pus")) <= 1800000000L)
      .select("p_id", "c_id")
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
  }
}
