package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity pins for the fixture-independent library API (graft.api.Pipelines):
  * each generic operator reproduces the corresponding graded fixture query
  * on the fixture tables at sf0.001.
  */
class PipelinesSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf
  private def docs = graft.T.t(s, sf, "documents")

  test("dedupExact survivor count matches dedup_exact") {
    val survivors = graft.api.Pipelines.dedupExact(docs, "doc_id", "text").count()
    val declared = SparkEntry.queries("dedup_exact")(s, sf)
      .filter(col("metric") === "survivors").head.getLong(1)
    assert(survivors == declared)
  }

  test("nearDupPairs matches the graded exact-Jaccard pair set") {
    val api = graft.api.Pipelines.nearDupPairs(docs, "doc_id", "text")
      .select(col("ia"), col("ib"), round(col("jac"), 6).as("jac"))
    val graded = SparkEntry.queries("dedup_ngram_jaccard")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("nearDupPairsLSH matches the exact pair set (recall 1.0 on fixtures)") {
    val lsh = graft.api.Pipelines.nearDupPairsLSH(docs, "doc_id", "text")
      .select(col("ia"), col("ib"), round(col("jac"), 6).as("jac"))
    val exact = graft.api.Pipelines.nearDupPairs(docs, "doc_id", "text")
      .select(col("ia"), col("ib"), round(col("jac"), 6).as("jac"))
    assert(lsh.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(lsh).count() == 0)
  }

  test("clusterComponents matches dedup_cluster_components") {
    val pairs = graft.api.Pipelines.nearDupPairs(docs, "doc_id", "text")
    val api = graft.api.Pipelines.clusterComponents(pairs.select("ia", "ib"))
    val graded = SparkEntry.queries("dedup_cluster_components")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("cosineTopK matches vector_cosine_topk") {
    graft.functions.GraftFunctions.register(s)
    val e = graft.T.t(s, sf, "embeddings")
    val api = graft.api.Pipelines.cosineTopK(
      e.filter(col("vec_id") < 20), e.filter(col("vec_id") >= 20),
      "vec_id", "vec_id", "embedding", 5)
    val graded = SparkEntry.queries("vector_cosine_topk")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("asofBackward matches join_asof's prior timestamps") {
    val ev = graft.T.t(s, sf, "events")
      .filter(col("event_type").isin("purchase", "click", "signup"))
    val left = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val right = ev.filter(col("event_type") =!= "purchase")
      .select("user_id", "ts")
    val api = graft.api.Pipelines
      .asofBackward(left, right, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof_ts"))
    val graded = SparkEntry.queries("join_asof")(s, sf)
      .select(col("event_id"), col("prior_ts"))
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("sessionize session counts match stream_session_window") {
    val api = graft.api.Pipelines
      .sessionize(graft.T.t(s, sf, "events"), "user_id", "ts",
        gapSeconds = 1800, tieBreak = Seq("event_id"))
      .groupBy("user_id")
      .agg(max(col("session_id")).as("n_sessions"))
    val graded = SparkEntry.queries("stream_session_window")(s, sf)
      .select(col("user_id"), col("n_sessions"))
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("funnelStages matches window_funnel_stages' stage counts") {
    val api = graft.api.Pipelines
      .funnelStages(graft.T.t(s, sf, "events"), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
    val graded = SparkEntry.queries("window_funnel_stages")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("hashSample matches etl_sample_hash's key set") {
    val api = graft.api.Pipelines
      .hashSample(graft.T.t(s, sf, "orders"), "o_orderkey")
      .select("o_orderkey")
    val graded = SparkEntry.queries("etl_sample_hash")(s, sf).select("o_orderkey")
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("histogram matches agg_histogram_fixed") {
    val orders = graft.T.t(s, sf, "orders")
    val api = graft.api.Pipelines.histogram(orders,
        round(col("o_totalprice") * 100).cast("long"), 2500000L)
      .select("bucket", "lo_edge", "cnt")
    val graded = SparkEntry.queries("agg_histogram_fixed")(s, sf)
      .select(col("bucket"), (col("lo_edge") * 100).as("lo_edge"), col("cnt"))
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("zorderKey matches etl_zorder_layout's interleave") {
    val orders = graft.T.t(s, sf, "orders")
    val z = orders.select(
      graft.api.Pipelines.zorderKey(
        col("o_custkey").bitwiseAND(lit(255L)),
        expr("cast(round(o_totalprice * 100) as bigint) DIV 2500000")
          .bitwiseAND(lit(255L))).as("zval"))
    // same per-64 block counts as the graded audit
    val api = z.withColumn("zblock", expr("zval DIV 64"))
      .groupBy("zblock").agg(count(lit(1)).as("cnt"))
    val graded = SparkEntry.queries("etl_zorder_layout")(s, sf)
      .select("zblock", "cnt")
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("qualityFilter retains exactly the docs passing the thresholds") {
    val kept = graft.api.Pipelines.qualityFilter(docs, "text", 50, 0.2).count()
    val expected = docs
      .withColumn("n", size(split(col("text"), " ")))
      .withColumn("st", size(filter(split(col("text"), " "),
        t => t.isin("the", "a", "of", "and", "to", "in", "is"))))
      .filter(col("n") >= 50 && col("st") * 1000 <= col("n") * 200)
      .count()
    assert(kept == expected)
  }

  test("containmentPairs matches the graded dedup_containment pair set") {
    val api = graft.api.Pipelines.containmentPairs(docs, "doc_id", "text")
      .select(col("ia"), col("ib"), round(col("containment"), 6).as("containment"))
    val graded = SparkEntry.queries("dedup_containment")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("cosineTopKReranked matches the graded two-stage rerank result") {
    graft.functions.GraftFunctions.register(s)
    val e = graft.T.t(s, sf, "embeddings")
    val api = graft.api.Pipelines.cosineTopKReranked(
      e.filter(col("vec_id") >= 20 && col("vec_id") < 40),
      e.filter(col("vec_id") >= 40), "vec_id", "vec_id", "embedding", 5)
      .withColumn("rnk", col("rnk").cast("int"))
    val graded = SparkEntry.queries("vector_rerank_two_stage")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("retentionMatrix matches window_retention_cohort") {
    val ev = graft.T.t(s, sf, "events")
    val api = graft.api.Pipelines.retentionMatrix(ev, "user_id", "ts")
    val graded = SparkEntry.queries("window_retention_cohort")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("weightedJaccardPairs matches the graded dedup_weighted_jaccard set") {
    val api = graft.api.Pipelines.weightedJaccardPairs(docs, "doc_id", "text")
      .select(col("ia"), col("ib"), round(col("wjac"), 6).as("wjac"))
    val graded = SparkEntry.queries("dedup_weighted_jaccard")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("pointInTime matches join_point_in_time's version histogram") {
    val orders = graft.T.t(s, sf, "orders")
    val versions = orders
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("vd"),
        col("o_orderkey"))
      .withColumn("version", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
          .orderBy("vd", "o_orderkey")))
    val probes = graft.T.t(s, sf, "lineitem")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_shipdate").cast("date").as("pd"))
    val api = graft.api.Pipelines.pointInTime(
        versions, probes, "o_custkey", "vd", "pd")
      .groupBy("version").agg(count(lit(1)).as("n_lineitems"))
    val graded = SparkEntry.queries("join_point_in_time")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("pointInTimeEnrich carries arbitrary payload columns (VERDICT r7 #10)") {
    val orders = graft.T.t(s, sf, "orders")
    val versions = orders
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("vd"),
        col("o_orderkey"))
      .withColumn("version", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
          .orderBy("vd", "o_orderkey")))
    val probes = graft.T.t(s, sf, "lineitem")
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_shipdate").cast("date").as("pd"))
    // multi-column payload: the numeric id AND the source order key ride
    // along; the id column must agree row-for-row with pointInTime's map
    val enriched = graft.api.Pipelines.pointInTimeEnrich(
      versions, probes, "o_custkey", "vd", "pd",
      Seq("version", "o_orderkey", "vd"))
    val viaEnrich = enriched.select(col("o_custkey"), col("pd"),
      coalesce(col("version").cast("long"), lit(0L)).as("version"))
    val viaId = graft.api.Pipelines.pointInTime(
      versions, probes, "o_custkey", "vd", "pd")
    assert(viaEnrich.exceptAll(viaId).count() == 0)
    assert(viaId.exceptAll(viaEnrich).count() == 0)
    // the carried (o_orderkey, vd) pair must BE the version row it claims:
    // joining back onto the version table on the id must reproduce them
    val bad = enriched.filter(col("version").isNotNull)
      .join(versions.select(col("o_custkey"), col("version"),
          col("o_orderkey").as("_ok"), col("vd").as("_vd")),
        Seq("o_custkey", "version"))
      .filter(col("o_orderkey") =!= col("_ok") || col("vd") =!= col("_vd"))
    assert(bad.count() == 0)
  }

  test("slidingDistinct matches window_sliding_distinct_users") {
    val ev = graft.T.t(s, sf, "events")
    val api = graft.api.Pipelines.slidingDistinct(ev, "user_id", "ts")
    val graded = SparkEntry.queries("window_sliding_distinct_users")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("topKGlobal == unpartitioned-window rank, without the global sort") {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.T.t(s, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
    val ord = Seq(col("c").desc, col("user_id").asc)
    val api = graft.api.Pipelines.topKGlobal(counts, 25, ord: _*)
    val reference = counts
      .withColumn("rnk", row_number().over(Window.orderBy(ord: _*)).cast("int"))
      .filter(col("rnk") <= 25)
    assert(api.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(api).count() == 0)
    // and the plan is the scale-safe one: a TakeOrdered bounds the window
    val plan = api.queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("shardManifest matches multimodal_shard_manifest") {
    val api = graft.api.Pipelines.shardManifest(
        docs, "source", "doc_id", "n_chars", 100000L)
      .withColumnRenamed("shard_ix", "six")
      .select(col("source"), col("six").cast("long").as("shard_ix"),
        col("n_docs"), col("n_bytes"))
    val graded = SparkEntry.queries("multimodal_shard_manifest")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("triangleCount matches graph_triangle_count on the co-purchase graph") {
    val li = graft.T.t(s, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    val edges = li.select(col("l_orderkey").as("k"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey").as("k"), col("l_partkey").as("b")), "k")
      .filter(col("a") =!= col("b")).select("a", "b")
    val api = graft.api.Pipelines.triangleCount(edges, "a", "b")
      .head().getAs[Long]("n_triangles")
    val graded = SparkEntry.queries("graph_triangle_count")(s, sf)
      .head().getAs[Long]("n_triangles")
    assert(api == graded)
  }

  test("triangleCount works for non-bigint node id columns (ADVICE r7)") {
    import s.implicits._
    // K4 minus one edge = 2 triangles, as INT ids and as STRING ids
    val intEdges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4)).toDF("a", "b")
    assert(graft.api.Pipelines.triangleCount(intEdges, "a", "b")
      .head().getAs[Long]("n_triangles") == 2L)
    val strEdges = intEdges.select(
      concat(lit("n"), col("a")).as("a"), concat(lit("n"), col("b")).as("b"))
    assert(graft.api.Pipelines.triangleCount(strEdges, "a", "b")
      .head().getAs[Long]("n_triangles") == 2L)
  }

  test("kmvDistinct matches agg_kmv_distinct's sketch state") {
    graft.functions.GraftFunctions.register(s)
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val api = graft.api.Pipelines.kmvDistinct(toks, "tok", 64).head()
    val graded = SparkEntry.queries("agg_kmv_distinct")(s, sf).head()
    assert(api.getAs[Long]("kth_hash") == graded.getAs[Long]("kth_hash"))
    assert(api.getAs[Long]("est_kmv") == graded.getAs[Long]("est_kmv"))
  }

  test("rerankRecall attests 1.0 for the graded (k=5, coarseK=50) setting") {
    graft.functions.GraftFunctions.register(s)
    val e = graft.T.t(s, sf, "embeddings")
    val rec = graft.api.Pipelines.rerankRecall(
      e.filter(col("vec_id") < 20), e.filter(col("vec_id") >= 20),
      "vec_id", "vec_id", "embedding", 5, 50)
    assert(rec.filter(col("recall") < 1.0).count() == 0)
  }

  test("rerankRecall is 1.0 when the corpus is smaller than k (ADVICE r7)") {
    graft.functions.GraftFunctions.register(s)
    val e = graft.T.t(s, sf, "embeddings")
    // 3 candidates, k=5: identical exact/two-stage results must read 1.0
    val rec = graft.api.Pipelines.rerankRecall(
      e.filter(col("vec_id") < 5), e.filter(col("vec_id").between(5, 7)),
      "vec_id", "vec_id", "embedding", 5, 50)
    assert(rec.filter(col("recall") < 1.0).count() == 0)
  }

  test("contextPack matches pipeline_context_pack") {
    val withToks = docs.withColumn("toks",
      size(split(col("text"), " ")).cast("long"))
    val api = graft.api.Pipelines.contextPack(
        withToks, "lang", "doc_id", "toks", 2048L)
      .select("lang", "ctx_ix", "n_docs", "n_tokens")
    val graded = SparkEntry.queries("pipeline_context_pack")(s, sf)
    assert(api.exceptAll(graded).count() == 0)
    assert(graded.exceptAll(api).count() == 0)
  }

  test("ssspFrontier matches graph_sssp_frontier on the trade graph") {
    val li = graft.T.t(s, sf, "lineitem").select("l_orderkey", "l_suppkey")
    val ord = graft.T.t(s, sf, "orders").select("o_orderkey", "o_custkey")
    val cust = graft.T.t(s, sf, "customer").select("c_custkey", "c_nationkey")
    val supp = graft.T.t(s, sf, "supplier").select("s_suppkey", "s_nationkey")
    val e = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), expr("1L + 1000L DIV (1L + cnt)").as("cost"))
    val api = graft.api.Pipelines.ssspFrontier(e, "src", "dst", "cost", 0L, 6)
    // the generic operator derives its node set from the edges; the graded
    // key spines over the nation table — compare on the common nodes
    val graded = SparkEntry.queries("graph_sssp_frontier")(s, sf)
      .withColumnRenamed("dist_6hop", "dist")
    val a = api.collect().map(r => r.getAs[Number](0).longValue ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val g = graded.collect().map(r => r.getAs[Number](0).longValue ->
      (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(a.keySet.subsetOf(g.keySet))
    assert(a.forall { case (n, d) => g(n) == d })
  }

  test("kcorePeel matches graph_kcore_peel's peel curve") {
    val li = graft.T.t(s, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    val e = li.select(col("l_orderkey").as("k"), col("l_partkey").as("pa"))
      .join(li.select(col("l_orderkey").as("k"), col("l_partkey").as("pb")), "k")
      .filter(col("pa") < col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
    val api = graft.api.Pipelines.kcorePeel(e, "src", "dst", 10, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val graded = SparkEntry.queries("graph_kcore_peel")(s, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(api.sortBy(_._1) == graded.sortBy(_._1))
  }
}
