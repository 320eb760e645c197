package graft

import org.apache.spark.sql.catalyst.expressions.{Divide, Expression,
  Multiply, Pmod, Remainder}
import org.apache.spark.sql.execution.{GenerateExec, SparkPlan,
  TakeOrderedAndProjectExec, GlobalLimitExec, LocalLimitExec,
  CollectLimitExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
  CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.types.DecimalType

/** Executed-plan red-flag audit for every registered query:
  * unintended CartesianProduct/BroadcastNestedLoopJoin, un-pruned lineitem
  * scans (ReadSchema listing all 11 columns), missing PushedFilters on
  * filtered scans, and unpartitioned WindowExec over a non-limited input
  * (the single-partition global sort that kills a 100 TB plan).
  *
  * r11 (VERDICT r10 #3): the allowlists are no longer suppressions — each
  * entry carries the DOCUMENTED row bound of the shape that justifies it
  * (broadcast build-side rows for nested-loop joins, window-input rows for
  * unpartitioned windows), and the audit MEASURES the actual cardinality by
  * executing just that subtree and FLAGS any allowlisted key whose measured
  * rows exceed its bound. Growing an allowlisted broadcast past its
  * documented bound now fails the audit instead of hiding behind the list.
  * Bounds are sf-invariant by construction (calendar spines, enum domains,
  * fixed query sets, value-domain spines) — that is exactly what makes the
  * shapes scale-safe. CONTRACT (-1) marks the few keys whose nested join is
  * data-sized BY SEMANTICS (brute force IS the query); those stay
  * suppressed and say so.
  * Test/runMain graft.DrivePlanAudit [sfDir] */
object DrivePlanAudit {
  private val CONTRACT = -1L // data-sized by declared semantics; no bound
  private val SCALAR = 64L // 1-row..tens-row scalar/anchor/enum broadcasts
  private val FANOUT = 512L // query sets / centroid grids / replication fans
  private val DAYSPINE = 40L // ≤31-row calendar-day spine
  private val PAIRSPINE = 1024L // ≤31·32/2 day-pair theta self-join
  private val CENTS = 50000L // 2dp value-DOMAIN spine (≤49k distinct cents)

  // nested-loop joins by design, with the documented bound of the
  // broadcast/smaller side. Shapes, by round of introduction:
  //  r2-4: explicit cartesians, all-pairs vector similarity (brute force IS
  //  the semantics; IVF probes prune the pair space but cells still pair
  //  all-vs-all), 1-row scalar broadcasts, salt-replication crossJoin.
  //  (dedup_embedding_cosine was REMOVED in r7: it ran banded LSH r7–r12 —
  //  a BNLJ reappearing there flagged, as intended. r13 re-graded the pair
  //  to capped-absolute PANEL audits — broadcast(panel) × corpus where the
  //  panel is ≤ ~205 rows AT ANY CORPUS SIZE by the count-derived modulus
  //  md = max(10, ⌈n/200⌉) — so r14 re-adds both with the measured FANOUT
  //  bound; the audit still flags if the panel ever outgrows the cap.)
  //  r5: 1-row audit scalars, all-pairs int8 ranking, Lloyd k-centroid loop.
  //  r6: 1-row stats/watermark/total/span broadcasts; broadcast-query-set
  //  coarse stages where all-vs-queries IS the semantics.
  //  r7: enum-sized stat broadcasts (NB 20×8 grid, month table), k-th-min /
  //  CUSUM / median / SPRT scalars, 2-row lag replication.
  //  r8: 8-row IVF-PQ coarse fan-out, KS scalars, ≤31²-pair Mann-Kendall
  //  day-spine theta join, ANOVA/perceptron/mixture scalars.
  //  r9: Theil-Sen pair spine, stump min/max scalars, funnel total,
  //  equi-depth decile array, 20-query hamming ANN, modularity edge count,
  //  KMV algebra scalars, CBO/PSI scalars, calibration grid.
  //  r10: recall-audit ground truth (20-query contract + 8-centroid IVF),
  //  k-fold total-moments row, farthest-point k−1 one-row layers, Cramér/MI
  //  grand totals, drill-down/freshness scalars, KL corpus totals, dedup
  //  audit counts, kappa/HITS/Ljung-Box/Kaplan-Meier scalars, LOOCV eval
  //  slice, Fleiss pair, power-iteration normalizer, 3-row walk fan-out,
  //  layout-audit bounds, logreg moment row, rate-test exposures, 16×16
  //  shard intervals, dispersion/bloom/assoc/RFM/heavy-change scalars,
  //  time-decay anchor, JS totals, funnel stages, capture-recapture counts,
  //  apportionment leftover, phrase counts, vocab doc count, 8-projection
  //  JL fan-out, aging/top-N/VaR/ECE/chi2/ATE/time-in-state/latency
  //  scalars, 4-size learning curve, 9-threshold PR fan-out, ×200
  //  permutation replication (the permutation SET is the semantics),
  //  rich-club 4-k ladder, 9-decile Q-Q fan-out, DW coefficient row,
  //  pseudonymizer collision row, Theil total, gain/lift population row,
  //  Walsh-pair spine, U/AUC population scalar, record-high harmonic
  //  spine, diff-profile/selectivity one-agg-row-per-label selects.
  private val intendedNested: Map[String, Long] = Map(
    // r13 capped-panel audits: broadcast panel ≤ ~205 rows at ANY corpus
    // size (md = max(10, ⌈n/200⌉)); the corpus side streams through one
    // codegen'd vec_dot pass — PlanShapeSpec pins the exchange count
    "dedup_embedding_cosine" -> FANOUT,
    "stream_dedup_neardup" -> FANOUT,
    "join_cross_limited" -> CONTRACT, // explicit limited cartesian
    "vector_cosine_topk" -> FANOUT, // 20-query broadcast
    "vector_knn_classify" -> FANOUT,
    "vector_ivf_topk" -> FANOUT, // 8-row coarse-centroid stage
    "similarity_join_threshold" -> CONTRACT, // all-pairs IS the semantics
    // r15 three-decade measurement: at τ=0.35 NO feasible banding prunes
    // (admitted random fraction ≥ 2.7× all pairs; exp 1.87 / 194 GB spill
    // at ×100), so cosineThresholdJoinLSH's economics branch takes the
    // tiled exact join here — the cartesian IS the cheapest correct plan
    "similarity_join_lsh" -> CONTRACT,
    "text_tfidf_top_terms" -> FANOUT,
    "stream_dedup_stateful" -> CONTRACT, // batch-vs-state by contract
    "join_skew_salted" -> SCALAR, // salt-replication table
    "agg_approx_quantile" -> SCALAR, "agg_hll_sketch_merge" -> SCALAR,
    "etl_compact_small_files" -> SCALAR,
    "vector_quantized_topk" -> FANOUT, "ml_kmeans_lloyd" -> SCALAR,
    "dq_anomaly_zscore" -> SCALAR, "etl_incremental_watermark" -> SCALAR,
    "text_bigram_pmi" -> SCALAR, "text_bm25_topk" -> FANOUT,
    "window_cumulative_share" -> SCALAR,
    "window_sliding_distinct_users" -> SCALAR,
    "pipeline_rag_retrieval" -> FANOUT, "vector_rerank_two_stage" -> FANOUT,
    "stat_chi2_independence" -> SCALAR, "stat_benford_digit" -> SCALAR,
    "ts_seasonal_index" -> SCALAR, "ml_naive_bayes_classify" -> FANOUT,
    "graph_triangle_count" -> SCALAR, "agg_frequent_pairs" -> SCALAR,
    "vector_matryoshka_prefix_topk" -> FANOUT,
    "agg_kmv_distinct" -> SCALAR, "ts_changepoint_cusum" -> SCALAR,
    "stat_runs_test" -> SCALAR, "ml_ab_sequential_sprt" -> SCALAR,
    "ts_autocorr_lag" -> SCALAR, "etl_partition_advisor" -> SCALAR,
    "vector_ivfpq_topk" -> FANOUT, "vector_ivfpq_residual_topk" -> FANOUT,
    "stat_ks_two_sample" -> SCALAR, "stat_mann_kendall" -> DAYSPINE,
    "stat_anova_oneway" -> SCALAR, "ml_perceptron_epochs" -> SCALAR,
    "pipeline_mixture_sample" -> SCALAR,
    "stat_theil_sen_slope" -> DAYSPINE, "ml_decision_stump" -> SCALAR,
    "pipeline_filter_funnel" -> SCALAR, "agg_histogram_equidepth" -> SCALAR,
    "vector_binary_hamming_topk" -> FANOUT, "graph_modularity" -> SCALAR,
    "agg_kmv_set_ops" -> SCALAR,
    "catalog_join_card_estimate" -> SCALAR,
    "dq_population_stability" -> SCALAR, "ml_calibration_bins" -> SCALAR,
    "vector_recall_at_k" -> FANOUT, "ml_ridge_kfold_cv" -> SCALAR,
    "vector_maxmin_diversity" -> SCALAR,
    "stat_cramers_v" -> SCALAR, "stat_mutual_information" -> SCALAR,
    "agg_share_of_parent" -> SCALAR, "dq_freshness_sla" -> SCALAR,
    "text_kl_divergence" -> SCALAR, "dedup_simhash_recall_audit" -> SCALAR,
    "stat_cohens_kappa" -> SCALAR, "graph_hits_hubs" -> SCALAR,
    "stat_ljung_box" -> SCALAR, "window_kaplan_meier" -> SCALAR,
    "ml_knn_loocv" -> FANOUT, "stat_fleiss_kappa" -> SCALAR,
    "ml_pca_power_iteration" -> SCALAR, "graph_walk_corpus" -> SCALAR,
    "etl_clustering_depth_audit" -> SCALAR,
    "ml_logreg_newton_step" -> SCALAR, "stat_poisson_two_rate" -> SCALAR,
    "etl_shard_rebalance_plan" -> FANOUT,
    "text_term_dispersion" -> SCALAR,
    "join_bloom_fp_audit" -> SCALAR,
    "agg_assoc_rules_lift" -> SCALAR, "window_rfm_segments" -> SCALAR,
    "agg_heavy_change_topk" -> SCALAR,
    "agg_time_decay_engagement" -> SCALAR, "text_js_divergence" -> SCALAR,
    "window_funnel_time_bound" -> SCALAR, "stat_capture_recapture" -> SCALAR,
    "pipeline_budget_apportion" -> SCALAR,
    "text_phrase_index_query" -> SCALAR, "text_vocab_growth" -> SCALAR,
    "vector_jl_projection_audit" -> FANOUT,
    "agg_aging_buckets" -> SCALAR, "agg_topn_other_rollup" -> SCALAR,
    "agg_var_cvar" -> SCALAR, "ml_expected_calibration_error" -> SCALAR,
    "ml_learning_curve" -> SCALAR, "ml_pr_curve_points" -> SCALAR,
    "stat_chi2_residuals" -> SCALAR, "stat_permutation_test" -> FANOUT,
    "stat_qq_deciles" -> SCALAR, "stat_stratified_ate" -> SCALAR,
    "window_time_in_state" -> SCALAR, "window_conversion_latency" -> SCALAR,
    "graph_rich_club" -> SCALAR,
    "stat_durbin_watson" -> SCALAR, "etl_pii_pseudonymize" -> SCALAR,
    "agg_theil_index" -> SCALAR, "ml_gain_lift_chart" -> SCALAR,
    "stat_hodges_lehmann" -> PAIRSPINE,
    "stat_u_auc_identity" -> SCALAR,
    "ts_record_highs" -> DAYSPINE,
    "etl_column_diff_profile" -> SCALAR,
    "catalog_predicate_selectivity" -> SCALAR,
    // r11: the ntile/cume re-plan's 1-row N-total broadcast
    "window_ntile_cume" -> SCALAR)

  // Unpartitioned windows whose input is GLOBALLY BOUNDED BY SEMANTICS
  // rather than by a visible limit in the plan, with the documented input
  // bound. Every other empty-partition WindowExec must sit above a limit
  // (the TakeOrdered re-plan) or it flags. The audit prints `globalwin-ok`
  // with the measured input rows — prune entries that stop printing.
  private val intendedGlobalWindow: Map[String, Long] = Map(
    "window_moving_avg" -> DAYSPINE, // one row per calendar day
    // r11: the audit's first measured run caught the old comment lying —
    // the ntile/cume window ran over the DATA-SIZED customer table
    // (150 rows at sf0.001, i.e. all of them). Re-planned: the global
    // window now runs on the distinct-acctbal cents spine (domain
    // [-999.99, 9999.99] → ≤1.1M rows at ANY sf) with per-value ranks
    // partitioned by bal.
    "window_ntile_cume" -> 1100000L,
    "ts_changepoint_cusum" -> DAYSPINE, // CUSUM prefix sums on day spine
    "stat_runs_test" -> DAYSPINE, // rank + lag over the day spine
    "ml_ab_sequential_sprt" -> DAYSPINE, // day-offset parallel prefix sum
    "etl_partition_advisor" -> DAYSPINE, // median rank over day spine
    "stat_ks_two_sample" -> (2 * DAYSPINE), // ECDF over 2-type spine union
    "stat_theil_sen_slope" -> PAIRSPINE, // median rank over day-pair join
    "ml_decision_stump" -> SCALAR, // cumulative counts over 20-bin grid
    // r16: decile-boundary rank location runs on the cents>>16 bucket
    // spine — price-DOMAIN-bounded (~170 rows at any sf), not data-sized
    "agg_histogram_equidepth" -> 4096L,
    "stat_spearman_rank" -> (2 * DAYSPINE), // purchase/click day spines
    "window_skyline_2d" -> 2600L, // per-day max-price running max over the
    // ORDERS calendar (1992-1998 → ≤2557 days; 1094 populated at sf0.001)
    "pipeline_sample_temperature" -> SCALAR, // 5-row lang-enum allocation
    "stat_wilcoxon_rank_sum" -> CENTS, // distinct 2dp value domain
    "stat_ljung_box" -> DAYSPINE, // row_number + lag over day spine
    "window_kaplan_meier" -> DAYSPINE, // ≤31-step lifetime spine
    "ml_threshold_sweep" -> CENTS, // suffix tp/fp over value domain
    "etl_shard_rebalance_plan" -> SCALAR, // ≤16-row shard enum
    "etl_snapshot_expire_plan" -> (4 * DAYSPINE), // calendar month table
    "ts_stl_decompose" -> DAYSPINE, "ts_velocity_accel" -> DAYSPINE,
    "window_rolling_beta" -> DAYSPINE, "ts_seasonality_strength" -> DAYSPINE,
    "agg_var_cvar" -> DAYSPINE, "dq_volume_anomaly" -> DAYSPINE,
    "stat_kruskal_wallis" -> CENTS, "stat_cvm_two_sample" -> CENTS,
    "stat_chi2_residuals" -> CENTS, "ml_pr_curve_points" -> CENTS,
    "agg_topn_other_rollup" -> SCALAR, // 25-brand top-N rank
    "pipeline_budget_apportion" -> SCALAR, // 20-source rank
    "text_vocab_growth" -> SCALAR, // 10-row decile cumsum
    "window_conversion_latency" -> CENTS, // minute-granular span spine
    "stat_durbin_watson" -> DAYSPINE,
    "ml_gain_lift_chart" -> CENTS, // DESC cumulative on distinct cents
    "ts_mase_naive" -> DAYSPINE,
    "stat_hodges_lehmann" -> PAIRSPINE, // Walsh pairs of the day spine
    "graph_degree_gini" -> 4096L, // LIMIT-2000-edge node set (≤4000)
    "stat_u_auc_identity" -> CENTS,
    "ts_record_highs" -> DAYSPINE,
    "stat_sign_test" -> DAYSPINE, "window_wma_triangular" -> DAYSPINE,
    "ml_reciprocal_rank_fusion" -> FANOUT) // doc_id<200 candidate set

  // ---- Decimal-on-amplified-rows detection (the r15 hash-repricing
  // class): decimal Multiply/Divide/Remainder/Pmod runs on Spark's
  // BigDecimal path (no codegen'd primitive), so a node that evaluates it
  // on more rows than any base table holds — above a row-multiplying
  // Generate/cartesian with no aggregate barrier — is per-row × replica
  // decimal arithmetic, the shape that cost stat_permutation_test 20×
  // steady (BASELINE.md). Two stages keep it precise: a structural
  // pre-filter on the static plan, then a MEASURED check on the finalized
  // plan — flag only when the decimal node's input rows exceed 4× the
  // largest fixture table, which a ×1 scalar crossJoin (every T.r6
  // projection) or a bounded spine fanout can never do, while a
  // data×replica stream always does. Bare casts feeding exact decimal SUM
  // buffers don't match hasDecOp (the exactness contract is not the
  // regression). Exposed private[graft] so DecFanoutSpec can pin both the
  // positive (the old regressed shape) and negative (r6-above-scalar-
  // crossjoin) cases.
  private[graft] def hasDecOp(e: Expression): Boolean = e.exists {
    case x: Multiply => x.dataType.isInstanceOf[DecimalType]
    case x: Divide => x.dataType.isInstanceOf[DecimalType]
    case x: Remainder => x.dataType.isInstanceOf[DecimalType]
    case x: Pmod => x.dataType.isInstanceOf[DecimalType]
    case _ => false
  }
  private[graft] def fanoutBelow(pl: SparkPlan): Boolean = pl match {
    case _: BaseAggregateExec | _: TakeOrderedAndProjectExec |
        _: GlobalLimitExec | _: CollectLimitExec => false
    case _: GenerateExec | _: CartesianProductExec |
        _: BroadcastNestedLoopJoinExec => true
    case q: QueryStageExec => fanoutBelow(q.plan)
    case r: ReusedExchangeExec => fanoutBelow(r.child)
    case other => other.children.exists(fanoutBelow)
  }
  private[graft] def decStructuralHit(plan: SparkPlan): Boolean = {
    var hit = false
    plan.foreach { node =>
      if (node.expressions.exists(hasDecOp) &&
          node.children.exists(fanoutBelow)) hit = true
    }
    hit
  }
  private[graft] def decAmplified(finalPlan: SparkPlan,
      threshold: Long): Seq[(String, Long)] = {
    val amplified = Seq.newBuilder[(String, Long)]
    walk(finalPlan) { node =>
      if (node.expressions.exists(hasDecOp) &&
          node.children.exists(fanoutBelow))
        node.children.flatMap(rowsOf).maxOption.foreach { r =>
          if (r > threshold) amplified += node.nodeName -> r
        }
    }
    amplified.result()
  }

  /** Pre-order walk through the FINALIZED adaptive plan, descending into
    * materialized query stages and reused exchanges (plain `collect` treats
    * QueryStageExec as a leaf and would miss every node executed in an
    * earlier stage). */
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case q: QueryStageExec => walk(q.plan)(f)
      case r: ReusedExchangeExec => walk(r.child)(f)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
      case _ => p.children.foreach(walk(_)(f))
    }
  }

  /** Measured output rows of a finalized, already-executed subtree: the
    * first pre-order node carrying a `numOutputRows` SQL metric (descending
    * through stage/exchange boundaries, which are row-preserving). No job
    * is run — the metrics were populated by the audit's one collect(). */
  private def rowsOf(p: SparkPlan): Option[Long] = {
    var res: Option[Long] = None
    def go(x: SparkPlan): Unit = if (res.isEmpty) x match {
      case q: QueryStageExec => go(q.plan)
      case r: ReusedExchangeExec => go(r.child)
      case other =>
        other.metrics.get("numOutputRows") match {
          case Some(m) => res = Some(m.value)
          case None => other.children.foreach(go)
        }
    }
    go(p)
    res
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else TestSpark.sf
    // largest base-table row count at the audit SF: the decimal-fanout
    // amplification threshold (a node evaluating decimal arithmetic on
    // > 4× this many rows is running per row × replica, not per row)
    lazy val maxBase: Long = Seq("lineitem", "orders", "events", "customer",
      "part", "documents", "embeddings", "supplier")
      .map(t => T.t(TestSpark.spark, sfDir, t).count()).max
    val s = TestSpark.spark
    var flags = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(s, sfDir)
        val qe = df.queryExecution
        val p = qe.executedPlan.toString
        // Executing once (only for keys that need measurement) finalizes
        // AQE and populates every node's SQL metrics; the finalized tree is
        // then walked through its stage boundaries.
        lazy val finalPlan: SparkPlan = {
          df.collect()
          qe.executedPlan
        }
        val nested = p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin")
        if (nested && !intendedNested.contains(name) && !name.contains("cross")) {
          println(s"AUDIT NESTED    $name"); flags += 1
        } else if (nested && intendedNested.get(name).exists(_ >= 0)) {
          // allowlisted with a numeric bound: measure the SMALLER side of
          // every nested node (the side the shape claims is bounded — at
          // toy sf the planner may broadcast the data side instead, so the
          // min is the honest scale invariant) and flag any over bound
          val bound = intendedNested(name)
          val nodes = Seq.newBuilder[Long]
          walk(finalPlan) {
            case b: BroadcastNestedLoopJoinExec =>
              (rowsOf(b.left), rowsOf(b.right)) match {
                case (Some(l), Some(r)) => nodes += math.min(l, r)
                case _ =>
              }
            case c: CartesianProductExec =>
              (rowsOf(c.left), rowsOf(c.right)) match {
                case (Some(l), Some(r)) => nodes += math.min(l, r)
                case _ =>
              }
            case _ =>
          }
          val measured = nodes.result()
          if (measured.isEmpty) {
            println(s"AUDIT nested-unmeasured $name")
          } else if (measured.max > bound) {
            println(s"AUDIT NESTEDBOUND $name rows=${measured.max} > bound=$bound")
            flags += 1
          } else {
            println(s"AUDIT nested-ok $name rows=${measured.max} bound=$bound")
          }
        } else if (nested && intendedNested.contains(name)) {
          println(s"AUDIT nested-contract $name (data-sized by semantics)")
        }
        // Unpartitioned WindowExec over a non-limited input: at 100 TB this
        // is "sort the whole relation on one task". Accept when a limit
        // (TakeOrdered / Global/Local/CollectLimit) bounds the window input,
        // or the key carries a semantics bound — which is then MEASURED.
        // Uses sparkPlan (pre-AQE) so WindowExec nodes are directly
        // collectable for detection; measurement walks the finalized plan.
        def limited(pl: SparkPlan): Boolean = pl.collectFirst {
          case _: TakeOrderedAndProjectExec => ()
          case _: GlobalLimitExec => ()
          case _: LocalLimitExec => ()
          case _: CollectLimitExec => ()
        }.isDefined
        val globalWins = qe.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !limited(w.child) => w
        }
        if (globalWins.nonEmpty && !intendedGlobalWindow.contains(name)) {
          println(s"AUDIT GLOBALWIN $name (${globalWins.size})"); flags += 1
        } else if (globalWins.nonEmpty) {
          val bound = intendedGlobalWindow(name)
          val inputs = Seq.newBuilder[Long]
          walk(finalPlan) {
            case w: WindowExec if w.partitionSpec.isEmpty && !limited(w.child) =>
              rowsOf(w.child).foreach(inputs += _)
            case _ =>
          }
          val measured = inputs.result()
          if (measured.isEmpty) {
            println(s"AUDIT globalwin-unmeasured $name")
          } else if (measured.max > bound) {
            println(s"AUDIT GLOBALWINBOUND $name rows=${measured.max} > bound=$bound")
            flags += 1
          } else {
            println(s"AUDIT globalwin-ok $name rows=${measured.max} bound=$bound")
          }
        }
        if (decStructuralHit(qe.sparkPlan)) {
          val hits = decAmplified(finalPlan, 4 * maxBase)
          if (hits.nonEmpty) {
            println(s"AUDIT DECFANOUT $name (${hits.map { case (n, r) =>
              s"$n rows=$r" }.distinct.mkString(", ")} > 4×base=${
              4 * maxBase})")
            flags += 1
          }
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
