package graft

/** Dump executed-plan red-flag audit for every registered query:
  * unintended CartesianProduct/BroadcastNestedLoopJoin, un-pruned lineitem
  * scans (ReadSchema listing all 11 columns), and missing PushedFilters on
  * filtered scans. Test/runMain graft.DrivePlanAudit [sfDir] */
object DrivePlanAudit {
  // nested-loop joins by design: explicit cartesians, all-pairs vector
  // similarity (brute force IS the semantics; IVF probes prune the pair
  // space but cells still pair all-vs-all), 1-row scalar broadcasts, and
  // the salt-replication crossJoin
  private val intendedNested = Set(
    "join_cross_limited",
    "vector_cosine_topk", "vector_knn_classify", "vector_ivf_topk",
    "similarity_join_threshold", "dedup_embedding_cosine",
    "text_tfidf_top_terms", "stream_dedup_stateful", "join_skew_salted",
    // round 5: 1-row audit/scalar crossJoins (agg_approx_quantile,
    // agg_hll_sketch_merge, etl_compact_small_files), the deliberate
    // all-pairs int8 ranking (vector_quantized_topk), and the k-row
    // centroid broadcast in the Lloyd loop (ml_kmeans_lloyd)
    "agg_approx_quantile", "agg_hll_sketch_merge", "etl_compact_small_files",
    "vector_quantized_topk", "ml_kmeans_lloyd",
    // round 6: 1-row stats/watermark/total/span broadcasts
    // (dq_anomaly_zscore, etl_incremental_watermark, text_bigram_pmi,
    // text_bm25_topk, window_cumulative_share,
    // window_sliding_distinct_users) and broadcast-query-set coarse
    // stages where all-vs-queries IS the semantics (pipeline_rag_retrieval,
    // vector_rerank_two_stage — the rerank's exact dot still runs only on
    // the top-50 survivors)
    "dq_anomaly_zscore", "etl_incremental_watermark", "text_bigram_pmi",
    "text_bm25_topk", "window_cumulative_share",
    "window_sliding_distinct_users", "pipeline_rag_retrieval",
    "vector_rerank_two_stage")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else TestSpark.sf
    val s = TestSpark.spark
    var flags = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(s, sfDir).queryExecution.executedPlan.toString
        val nested = p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
        if (nested && !intendedNested(name) && !name.contains("cross")) {
          println(s"AUDIT NESTED    $name"); flags += 1
        }
        val wideLineitem = "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate"
        if (p.contains(wideLineitem) && !Set("scan_parquet", "scalar_math_funcs", "bulk_load_pipeline").contains(name)) {
          println(s"AUDIT WIDESCAN  $name"); flags += 1
        }
      } catch {
        case e: Throwable => println(s"AUDIT ERROR     $name: ${e.getMessage.take(100)}"); flags += 1
      }
    }
    println(s"AUDIT DONE flags=$flags")
    s.stop()
  }
}
