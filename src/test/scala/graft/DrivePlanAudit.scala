package graft

import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec,
  GlobalLimitExec, LocalLimitExec, CollectLimitExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Dump executed-plan red-flag audit for every registered query:
  * unintended CartesianProduct/BroadcastNestedLoopJoin, un-pruned lineitem
  * scans (ReadSchema listing all 11 columns), missing PushedFilters on
  * filtered scans, and unpartitioned WindowExec over a non-limited input
  * (the single-partition global sort that kills a 100 TB plan).
  * Test/runMain graft.DrivePlanAudit [sfDir] */
object DrivePlanAudit {
  // nested-loop joins by design: explicit cartesians, all-pairs vector
  // similarity (brute force IS the semantics; IVF probes prune the pair
  // space but cells still pair all-vs-all), 1-row scalar broadcasts, and
  // the salt-replication crossJoin.
  // (dedup_embedding_cosine was REMOVED in r7: it runs banded LSH now — a
  // BNLJ reappearing there must flag, not be masked by a stale allowlist.)
  private val intendedNested = Set(
    "join_cross_limited",
    "vector_cosine_topk", "vector_knn_classify", "vector_ivf_topk",
    "similarity_join_threshold",
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
    "vector_rerank_two_stage",
    // round 7: 1-row / enum-sized stat broadcasts (total counts, marginal
    // tables, the 20×8 NB model grid, campaign month table) and the
    // broadcast-query-set coarse stage of the matryoshka rerank
    "stat_chi2_independence", "stat_benford_digit", "ts_seasonal_index",
    "ml_naive_bayes_classify", "graph_triangle_count", "agg_frequent_pairs",
    "vector_matryoshka_prefix_topk",
    // round 7b: 1-row sketch/stat broadcasts (k-th min hash, CUSUM
    // max/argmax scalars, median-of-30 scalar, SPRT crossing/final scalars)
    "agg_kmv_distinct", "ts_changepoint_cusum", "stat_runs_test",
    "ml_ab_sequential_sprt",
    // 2-row lag-k replication crossJoin (k ∈ {1, 7}); 1-row median scalar
    "ts_autocorr_lag", "etl_partition_advisor",
    // round 8: the 8-row coarse-centroid fan-out of the IVF-PQ probe
    // (same bounded cross-score as vector_ivf_topk; the corpus-sized
    // code scan itself is cell-pruned + hash-joined, PlanShapeSpec pin),
    // 1-row stat scalars of the KS test, and the ≤31²-pair bounded theta
    // self-join of the Mann-Kendall day spine
    "vector_ivfpq_topk", "vector_ivfpq_residual_topk",
    "stat_ks_two_sample", "stat_mann_kendall",
    // 1-row scalar crossJoin of the ANOVA A/B terms; the perceptron's
    // 1-row weight-vector broadcast per epoch (the Lloyd-centroid shape);
    // the mixture sampler's 1-row min-token scalar
    "stat_anova_oneway", "ml_perceptron_epochs", "pipeline_mixture_sample",
    // round 9: the ≤31²-pair bounded theta self-join of the Theil-Sen day
    // spine (mann_kendall's shape) and the stump's 1-row min/max + totals
    // scalar broadcasts
    "stat_theil_sen_slope", "ml_decision_stump",
    // round 9b: the funnel's 1-row corpus-total scalar broadcast and the
    // equi-depth histogram's 1-row decile-boundary array broadcast
    "pipeline_filter_funnel", "agg_histogram_equidepth",
    // round 9c: the 20-query broadcast of the binary-quantized ANN
    // (vector_cosine_topk's shape), the 1-row edge-count scalar of the
    // modularity score, and the 1-row sketch scalars of the KMV algebra
    "vector_binary_hamming_topk", "graph_modularity", "agg_kmv_set_ops",
    // round 9d: 1-row scalar broadcasts of the CBO estimate and the PSI
    // ref/cur totals
    "catalog_join_card_estimate", "dq_population_stability",
    // the calibration grid's 1-row min/max scalar (the stump's shape)
    "ml_calibration_bins",
    // round 10: the recall audit's brute-force ground-truth side is the
    // 20-query broadcast BY CONTRACT (vector_cosine_topk's shape) plus the
    // 8-row coarse-centroid fan-out of its IVF probe
    "vector_recall_at_k",
    // round 10b: the k-fold CV's 1-row total-moments broadcast (the
    // train = total − fold algebra needs every fold × the one total row)
    "ml_ridge_kfold_cv",
    // round 10c: farthest-point sampling's k−1 one-row chosen-point
    // broadcasts (the Lloyd-centroid shape — each refinement layer is
    // corpus × one picked row)
    "vector_maxmin_diversity",
    // round 10d: the 1-row grand-total scalar crossJoins of the Cramér's V
    // and mutual-information contingency tables (stat_chi2_independence's
    // exact shape)
    "stat_cramers_v", "stat_mutual_information",
    // round 10g: the drill-down's 1-row grand-total scalar crossJoin and
    // the freshness monitor's 1-row stream-head scalar crossJoin
    "agg_share_of_parent", "dq_freshness_sla",
    // round 10h: the KL screen's 1-row corpus-total scalar crossJoin and
    // the dedup audit's two 1-row count scalars (truth/candidate totals)
    "text_kl_divergence", "dedup_simhash_recall_audit",
    // round 10i: 1-row scalar crossJoins — kappa's marginal-product scalar,
    // HITS' per-round max-normalizer (the Lloyd-centroid shape), Ljung-Box's
    // n/Σx + denominator scalars, and Kaplan-Meier's user-total scalar
    "stat_cohens_kappa", "graph_hits_hubs", "stat_ljung_box",
    "window_kaplan_meier",
    // round 10j: the LOOCV's broadcast eval-slice × corpus scoring (the
    // vector_cosine_topk contract shape) and Fleiss' 1-row scalar pair
    "ml_knn_loocv", "stat_fleiss_kappa",
    // round 10k: power iteration's per-round 1-row max-normalizer (the
    // HITS shape), the walk corpus's 3-row walk-id fan-out, and the
    // layout audit's 1-row bounds scalar
    "ml_pca_power_iteration", "graph_walk_corpus",
    "etl_clustering_depth_audit",
    // round 10l: 1-row scalar crossJoins (logreg's moment row is itself
    // the whole fit; the rate test's exposure scalars; the rebalancer's
    // total) plus its ≤16×16 giver×taker interval-overlap theta join
    "ml_logreg_newton_step", "stat_poisson_two_rate",
    "etl_shard_rebalance_plan",
    // round 10m: the dispersion screen's 1-row source-count scalar
    "text_term_dispersion",
    // round 10n: the bloom audit's 1-row count scalars and the probe
    // generator's 1-row max-key scalar
    "join_bloom_fp_audit",
    // round 10o batch 15-17: 1-row scalar crossJoins (date anchors,
    // grand totals, order counts) and the RFM anchor broadcast
    "agg_assoc_rules_lift", "window_rfm_segments", "agg_heavy_change_topk",
    // round 10o batches 18-23: 1-row scalar totals (time-decay anchor,
    // JS-divergence corpus totals, funnel stage counts, capture-recapture
    // sample counts, apportionment leftover, phrase-audit counts,
    // vocab-growth doc count) and the JL audit's 8-projection fan-out
    // (the IVF coarse-stage contract shape)
    "agg_time_decay_engagement", "text_js_divergence",
    "window_funnel_time_bound", "stat_capture_recapture",
    "pipeline_budget_apportion", "text_phrase_index_query",
    "text_vocab_growth", "vector_jl_projection_audit",
    // round 10o batches 24-30: 1-row scalar crossJoins (aging totals,
    // top-N revenue total, VaR tail quantile, ECE max/total, chi2
    // margins, stratified-ATE naive row, time-in-state total, latency
    // population), the learning curve's 4-size and PR curve's 9-threshold
    // fan-outs, the permutation test's ×200 hash-relabel replication (the
    // permutation SET is the semantics), rich-club's 4-k ladder, and the
    // Q-Q table's 9-decile fan-out
    "agg_aging_buckets", "agg_topn_other_rollup", "agg_var_cvar",
    "ml_expected_calibration_error", "ml_learning_curve",
    "ml_pr_curve_points", "stat_chi2_residuals", "stat_permutation_test",
    "stat_qq_deciles", "stat_stratified_ate", "window_time_in_state",
    "window_conversion_latency", "graph_rich_club",
    // round 10o batch 31: the DW fit's 1-row coefficient broadcast +
    // Σe² scalar, and the pseudonymizer's 1-row collision-audit row
    "stat_durbin_watson", "etl_pii_pseudonymize",
    // round 10o batch 32-33: Theil's 1-row total broadcast, the gain/lift
    // chart's 1-row population-total broadcast + 10-row decile fan-out
    "agg_theil_index", "ml_gain_lift_chart",
    // round 10o batch 34: the Walsh-pair theta self-join on the ≤31-row
    // day spine (mann_kendall's bounded shape)
    "stat_hodges_lehmann",
    // round 10o batch 35: the U/AUC identity's 1-row population scalar
    "stat_u_auc_identity",
    // round 10o batch 37: record-high running max + the 31-row harmonic
    // spine crossJoin
    "ts_record_highs",
    // round 10o batch 38: the WMA/sign-test day spines reuse the standard
    // 1-row scalar shapes (diff profile + selectivity re-select ONE agg
    // row per output label)
    "etl_column_diff_profile", "catalog_predicate_selectivity")

  // Unpartitioned windows whose input is GLOBALLY BOUNDED BY SEMANTICS
  // rather than by a visible limit in the plan. Every other
  // empty-partition WindowExec must sit above a limit (the TakeOrdered
  // re-plan) or it flags. The audit prints `globalwin-ok` for allowlisted
  // hits — prune any entry that stops printing.
  private val intendedGlobalWindow = Set(
    "window_moving_avg",    // frame over ≤31 rows (one per calendar day)
    "window_ntile_cume",    // post-agg relation keyed by a bounded enum
    "ts_changepoint_cusum", // CUSUM prefix sums over the ≤31-day spine
    "stat_runs_test",       // rank + lag over the same ≤31-day spine
    "ml_ab_sequential_sprt", // day-offset table of the parallel prefix sum
                             // (≤31 rows; the event cumsum is day-keyed)
    "etl_partition_advisor", // median rank over the ≤31-day spine
    "stat_ks_two_sample",    // ECDF range frame over the ≤62-row day-
                             // spine union (two event types × ≤31 days)
    "stat_theil_sen_slope",  // median-selection rank over the ≤31²-pair
                             // day-spine self-join
    "ml_decision_stump",     // cumulative counts over the 20-bin grid
    "stat_spearman_rank",    // two permutation-rank windows over the
                             // ≤31-day purchase/click spine
    "window_skyline_2d",     // running-max over the per-day max-price
                             // spine: one row per CALENDAR day (bounded
                             // by the date range, not the data)
    "pipeline_sample_temperature", // largest-remainder rank over the
                             // 5-row LANG-ENUM allocation table (the
                             // per-doc rank window is lang-partitioned)
    "stat_wilcoxon_rank_sum", // cumulative counts over the DISTINCT-VALUE
                             // spine: ≤49k rows bounded by the 2dp value
                             // DOMAIN [0.01, 490], not by the data
    "stat_ljung_box",        // row_number + lag self-join over the ≤31-day
                             // spine (CUSUM's argument)
    "window_kaplan_meier",   // risk-set cumulative windows over the
                             // ≤31-step lifetime spine (day-granular
                             // event times bound the step count)
    "ml_threshold_sweep",    // suffix-cumulative tp/fp over the DISTINCT-
                             // VALUE spine (wilcoxon's domain bound);
                             // the winner is TakeOrdered(1)
    "etl_shard_rebalance_plan", // rank/cumsum windows over the ≤16-row
                             // SHARD-ENUM table (giver/taker intervals)
    "etl_snapshot_expire_plan", // recency rank over the CALENDAR-bounded
                             // month table (≤84 snapshots)
    // round 10o: day-spine windows (≤31 calendar rows — STL trend MA,
    // velocity/accel lags, rolling beta, seasonality strength, VaR rank,
    // volume-anomaly list window)
    "ts_stl_decompose", "ts_velocity_accel", "window_rolling_beta",
    "ts_seasonality_strength", "agg_var_cvar", "dq_volume_anomaly",
    // round 10o: DISTINCT-VALUE cents-spine windows (wilcoxon's 2dp
    // domain bound) — KW/CvM midrank spines, chi2-residual median spine,
    // PR-curve threshold spine
    "stat_kruskal_wallis", "stat_cvm_two_sample", "stat_chi2_residuals",
    "ml_pr_curve_points",
    // round 10o: enum-bounded spines — 25-brand top-N rank, 20-source
    // apportionment rank, 10-row vocab-growth decile cumsum, and the
    // minute-granular conversion-latency spine (bounded by the span's
    // minute count, not the data)
    "agg_topn_other_rollup", "pipeline_budget_apportion",
    "text_vocab_growth", "window_conversion_latency",
    // round 10o batch 31: DW's day-index and residual-lag windows on the
    // ≤31-row day spine
    "stat_durbin_watson",
    // round 10o batch 33: gain/lift DESC cumulative on the distinct-cents
    // spine; MASE lags on the day spine
    "ml_gain_lift_chart", "ts_mase_naive",
    // round 10o batch 34: HL rank over the ≤(31·32/2)-pair day-spine
    // self-join; degree-gini rank over the LIMIT-2000-edge node set
    // (≤4000 rows by construction)
    "stat_hodges_lehmann", "graph_degree_gini",
    // round 10o batch 35: the U spine cumsum over distinct cents
    "stat_u_auc_identity",
    // round 10o batch 37: record-high running max on the ≤31-row day spine
    "ts_record_highs",
    // round 10o batch 38: sign-test and WMA lag windows on the day spine
    "stat_sign_test", "window_wma_triangular",
    // round 10o batch 39: the RRF rankings run on the doc_id<200
    // CONSTANT-bounded candidate set (retrieval-list fusion contract)
    "ml_reciprocal_rank_fusion")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else TestSpark.sf
    val s = TestSpark.spark
    var flags = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(s, sfDir).queryExecution
        val p = qe.executedPlan.toString
        val nested = p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
        if (nested && !intendedNested(name) && !name.contains("cross")) {
          println(s"AUDIT NESTED    $name"); flags += 1
        }
        // Unpartitioned WindowExec over a non-limited input: at 100 TB this
        // is "sort the whole relation on one task". Accept when a limit
        // (TakeOrdered / Global/Local/CollectLimit) bounds the window input,
        // or the key is in the semantics-bounded allowlist. Uses sparkPlan
        // (pre-AQE) so WindowExec nodes are directly collectable.
        def limited(pl: SparkPlan): Boolean = pl.collectFirst {
          case _: TakeOrderedAndProjectExec => ()
          case _: GlobalLimitExec => ()
          case _: LocalLimitExec => ()
          case _: CollectLimitExec => ()
        }.isDefined
        val globalWins = qe.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !limited(w.child) => w
        }
        if (globalWins.nonEmpty && !intendedGlobalWindow(name)) {
          println(s"AUDIT GLOBALWIN $name (${globalWins.size})"); flags += 1
        } else if (globalWins.nonEmpty) {
          // informational: allowlisted global window actually present —
          // keeps the allowlist honest (prune entries that stop printing)
          println(s"AUDIT globalwin-ok $name (${globalWins.size})")
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
