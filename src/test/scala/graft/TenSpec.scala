package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the §2-W (round 10) keys. The DuckDB hash gate proves
  * engine parity; these pin the SEMANTICS (bounds, conservation laws,
  * determinism under repartitioning) that a matching pair of wrong answers
  * could not satisfy.
  */
class TenSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(key: String) = SparkEntry.queries(key)(s, sf)

  test("window_rolling_corr values stay in [-1, 1]") {
    val rows = run("window_rolling_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(2)) {
        val c = r.getDouble(2)
        assert(c >= -1.0 && c <= 1.0, s"corr out of range: $c")
      }
    }
  }

  test("ts_downsample_m4 selections bracket correctly and conserve counts") {
    val rows = run("ts_downsample_m4").collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val (n, vmin, vmax) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      val (vfirst, vlast) = (r.getDouble(5), r.getDouble(6))
      assert(vmin <= vmax)
      assert(vfirst >= vmin && vfirst <= vmax)
      assert(vlast >= vmin && vlast <= vmax)
      total += n
    }
    assert(total == T.t(s, sf, "events").count())
  }

  test("dq_outlier_iqr fences are ordered and shares bounded") {
    run("dq_outlier_iqr").collect().foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3)) // q1 <= q3
      val pct = r.getDouble(6)
      assert(pct >= 0.0 && pct <= 1.0)
    }
  }

  test("ml_eval_confusion conserves the event count and bounds metrics") {
    val r = run("ml_eval_confusion").collect().head
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn == T.t(s, sf, "events").count())
    Seq(4, 5, 6, 7).foreach { i =>
      val m = r.getDouble(i)
      assert(m >= 0.0 && m <= 1.0, s"metric $i out of range: $m")
    }
  }

  test("scalar_ip_funcs: octet recomposition and /24 arithmetic") {
    run("scalar_ip_funcs").collect().foreach { r =>
      val ip = r.getLong(1)
      val parts = r.getString(2).split("\\.").map(_.toLong)
      assert(parts.length == 4)
      assert(parts.forall(p => p >= 0 && p <= 255))
      assert(parts(0) * 16777216 + parts(1) * 65536 + parts(2) * 256 + parts(3) == ip)
      assert(r.getLong(4) == ip - parts(3)) // net24 zeroes the last octet
    }
  }

  test("scalar_url_funcs round-trips the synthesized components") {
    run("scalar_url_funcs").collect().foreach { r =>
      val docId = r.getLong(0)
      assert(r.getString(1) == "https")
      assert(r.getString(2).endsWith(".example.com"))
      assert(r.getString(3).contains(s"/doc/$docId"))
      assert(r.getString(4) == (docId % 7).toString)
    }
  }

  test("text_zipf_slope is negative (frequency falls with rank)") {
    val rows = run("text_zipf_slope").collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(r.getDouble(4) < 0.0, s"non-Zipfian: $r") }
  }

  test("text_hapax_ratio: hapax <= vocab <= tokens, shares in (0,1]") {
    run("text_hapax_ratio").collect().foreach { r =>
      val (vocab, hapax, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hapax <= vocab && vocab <= toks)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("stat_kendall_tau stays in [-1, 1] and pair counts are consistent") {
    val rows = run("stat_kendall_tau").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nc, nd) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nc + nd <= n * (n - 1) / 2)
      val tau = r.getDouble(4)
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("pipeline_sample_temperature: allocation sums to target and caps hold") {
    val rows = run("pipeline_sample_temperature").collect()
    assert(rows.map(_.getLong(2)).sum == 297L)
    rows.foreach { r =>
      val (nDocs, alloc, nSampled) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nSampled == math.min(alloc, nDocs))
    }
    // temperature flattening: the sampled share of a tail language must
    // exceed its corpus share (tau=0.5 upsamples the tail)
    val byLang = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val totalDocs = byLang.values.map(_._1).sum.toDouble
    val tail = byLang.minBy(_._2._1)
    assert(tail._2._2 / 297.0 > tail._2._1 / totalDocs)
  }

  test("graph_clustering_coeff: coefficients in [0,1], triangles bounded") {
    val rows = run("graph_clustering_coeff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, tri, coeff) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(tri <= d * (d - 1) / 2)
      assert(coeff >= 0.0 && coeff <= 1.0)
    }
  }

  test("vector_recall_at_k: 20 queries, recall bounded, IVF not degenerate") {
    val rows = run("vector_recall_at_k").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 5)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // nprobe=2 of 8 cells: mean recall must beat random cell coverage
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean >= 0.6, s"IVF recall@5 degenerate: $mean")
  }

  test("etl_equality_deletes conserves rows per segment") {
    val rows = run("etl_equality_deletes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4))
    }
    assert(rows.map(_.getLong(1)).sum == T.t(s, sf, "customer").count())
  }

  test("stat_bootstrap_ci brackets the point estimate") {
    val rows = run("stat_bootstrap_ci").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi)
      // 95% bootstrap CI of the mean contains the sample mean
      assert(mean >= lo && mean <= hi, s"CI [$lo,$hi] misses mean $mean")
    }
  }

  test("ml_ridge_2feature: fit is finite and beats the intercept-only model") {
    val r = run("ml_ridge_2feature").collect().head
    assert(r.getLong(0) == T.t(s, sf, "lineitem").count())
    val (b0, b1, b2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(!b0.isNaN && !b1.isNaN && !b2.isNaN)
    // ridge objective at the solution <= objective at b=0 (intercept-only),
    // so training MSE(ridge) <= MSE(mean-only) — a guaranteed invariant
    // (fixture prices are NOT quantity-linked, so no sign assumption holds)
    val j = T.t(s, sf, "lineitem")
      .join(T.t(s, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_quantity").as("x1"), col("p_retailprice").as("x2"),
        col("l_extendedprice").as("y"))
    val stats = j.agg(
      avg(col("y")).as("ybar"),
      avg(pow(col("y") - (lit(b0) + lit(b1) * col("x1") + lit(b2) * col("x2")), 2))
        .as("mseR")).collect().head
    val mse0 = j.agg(avg(pow(col("y") - lit(stats.getDouble(0)), 2)))
      .collect().head.getDouble(0)
    assert(stats.getDouble(1) <= mse0,
      s"ridge MSE ${stats.getDouble(1)} worse than mean-only $mse0")
  }

  test("agg_winsorized_mean: robust means sit inside the fences") {
    run("agg_winsorized_mean").collect().foreach { r =>
      val (p5, p95) = (r.getDouble(2), r.getDouble(3))
      val (trimmed, winsorized) = (r.getDouble(4), r.getDouble(5))
      assert(p5 <= p95)
      assert(trimmed >= p5 && trimmed <= p95)
      assert(winsorized >= p5 && winsorized <= p95)
    }
  }

  test("stat_wilcoxon_rank_sum: U bounds and z consistency") {
    val r = run("stat_wilcoxon_rank_sum").collect().head
    val (na, nb, u2) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(u2 >= 0 && u2 <= 2 * na * nb, s"2U=$u2 outside [0, ${2 * na * nb}]")
    assert(math.abs(r.getDouble(3)) < 50.0) // z is a standardized statistic
  }

  test("text_heaps_law_fit: sublinear vocabulary growth (0 < beta < 1)") {
    val r = run("text_heaps_law_fit").collect().head
    assert(r.getLong(0) == 20) // one point per source
    val beta = r.getDouble(1)
    assert(beta > 0.0 && beta < 1.0, s"non-Heapsian beta: $beta")
  }

  test("stat_levene_brown_forsythe: W >= 0 and dfs add up") {
    val r = run("stat_levene_brown_forsythe").collect().head
    val (k, n, df1, df2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(df1 == k - 1 && df2 == n - k)
    assert(n == T.t(s, sf, "events").count())
    assert(r.getDouble(4) >= 0.0)
  }

  test("join_spatial_grid agrees with the brute-force theta join") {
    // the grid re-plan must return EXACTLY the brute-force pairs
    val c = T.t(s, sf, "customer").select(col("c_custkey"),
      (col("c_custkey") * 2654435761L % 4294967296L % 10000).as("cx"),
      (col("c_custkey") * 2246822519L % 4294967296L % 10000).as("cy"))
    val sp = T.t(s, sf, "supplier").select(col("s_suppkey"),
      ((col("s_suppkey") * 2654435761L + 1013904223L) % 4294967296L % 10000).as("sx"),
      ((col("s_suppkey") * 2246822519L + 374761393L) % 4294967296L % 10000).as("sy"))
    val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
      (col("cy") - col("sy")) * (col("cy") - col("sy"))
    val brute = sp.crossJoin(c).filter(d2 <= 250000)
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"), min(d2).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val grid = run("join_spatial_grid").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(grid == brute, s"grid join != brute force")
  }

  test("ml_ridge_kfold_cv: folds partition the data and fits are finite") {
    val rows = run("ml_ridge_kfold_cv").collect()
    assert(rows.length == 5)
    val total = T.t(s, sf, "lineitem").count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == total) // n_train + n_test = N
      Seq(3, 4, 5, 6).foreach(i => assert(!r.getDouble(i).isNaN))
      assert(r.getDouble(6) >= 0.0) // rmse
    }
    assert(rows.map(_.getLong(2)).sum == total) // test folds partition N
  }

  test("ts_cross_correlation_lag: 8 lags, corr bounded, lag-0 pairs maximal") {
    val rows = run("ts_cross_correlation_lag").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 7L))
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0)
    }
    // shifting can only shrink the overlap of the two day spines
    assert(rows.head.getLong(1) == rows.map(_.getLong(1)).max)
  }

  test("pipeline_dedup_survivorship: one golden record per user, rules hold") {
    val rows = run("pipeline_dedup_survivorship").collect()
    val users = T.t(s, sf, "events").select("user_id").distinct().count()
    assert(rows.length == users)
    rows.foreach { r =>
      assert(r.getString(1) != null && r.getString(1).endsWith("@ex.com"))
      assert(Set("click", "error", "purchase", "signup", "view")(r.getString(2)))
      assert(r.getLong(5) >= 1)
    }
  }

  test("vector_maxmin_diversity: 5 distinct picks with non-decreasing cover") {
    val rows = run("vector_maxmin_diversity").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).distinct.length == 5) // no repicks
    // coverage radius (max-sim of the chosen point) is non-decreasing in
    // the greedy order: each later pick is at most as isolated
    val sims = rows.drop(1).map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a <= b },
      s"cover_sim not monotone: ${sims.mkString(",")}")
  }

  test("multimodal_tile_manifest: tiling covers the padded frame exactly") {
    run("multimodal_tile_manifest").collect().foreach { r =>
      val (w, h) = (r.getLong(1), r.getLong(2))
      val (tx, ty, padW, padH) = (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(tx * 32 == w + padW && ty * 32 == h + padH)
      assert(padW >= 0 && padW < 32 && padH >= 0 && padH < 32)
      assert(r.getLong(8) * 16 >= r.getLong(7)) // batches cover all tiles
    }
  }

  test("text_dedup_url_canonical collapses every dressing variant") {
    val rows = run("text_dedup_url_canonical").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getString(0)
      assert(c == c.toLowerCase)           // host lowered
      assert(!c.contains("?") && !c.endsWith("/")) // query + slash stripped
      assert(r.getLong(1) >= 2)
    }
    // every group of doc_ids sharing (doc_id % 250) canonicalizes together:
    // at sf0.001 (500 docs) each base has exactly 2 members
    val docs = T.t(s, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum == docs)
  }

  test("text_oov_rate: counts conserve and rates are bounded") {
    val rows = run("text_oov_rate").collect()
    assert(rows.length == 20) // one row per source
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("operator_asof_native ≡ the declarative window twin, via the native exec") {
    val ev = T.t(s, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val native = plans.AsOf.asofJoin(purchases, clicks,
        Seq("user_id"), Seq("c_user"), "ts", "c_ts", Seq("c_id"))
      .select("event_id", "c_id", "c_ts")
    // plan shape: the custom exec is present (injected via GraftExtensions
    // config in TestSpark — the cluster-wide path, no ensureRegistered call)
    // (SparkPlan node names strip the Exec suffix: the node prints "AsOfJoin")
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "native as-of exec missing from the physical plan")
    // declarative twin: union + running-max window over the mixed stream
    val okey = (expr("unix_micros(cast(ts as timestamp))")
      - lit(1704067200000000L)) * 1000000L + col("event_id")
    val base = ev.filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"),
        okey.as("okey"))
    val w = Window.partitionBy("user_id").orderBy("ts", "is_p", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val twin = base
      .withColumn("cok", max(when(col("is_p") === 0, col("okey"))).over(w))
      .filter(col("is_p") === 1)
      .select(col("event_id"), (col("cok") % 1000000L).as("c_id"))
    val n = native.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val t = twin.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(n == t, "native as-of != declarative window twin")
    assert(n.nonEmpty)
  }

  test("dq_schema_contract_check finds exactly the three planted violations") {
    val rows = run("dq_schema_contract_check").collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(rows == Map(
      "l_comment" -> "missing_column",
      "l_linenumber" -> "type_mismatch",
      "l_tax" -> "unexpected_column"))
  }

  test("stat_cramers_v is a bounded effect size over the right grid") {
    val r = run("stat_cramers_v").collect().head
    assert(r.getLong(0) == 5)                       // 5 event types
    assert(r.getLong(1) == 7)                       // 7 weekdays
    assert(r.getLong(2) == T.t(s, sf, "events").count())
    val v = r.getDouble(4)
    assert(v >= 0.0 && v <= 1.0, s"V out of [0,1]: $v")
  }

  test("stat_mutual_information cells conserve the event count") {
    val rows = run("stat_mutual_information").collect()
    assert(rows.map(_.getLong(2)).sum == T.t(s, sf, "events").count())
    // MI total is non-negative even though single cells may dip negative
    assert(rows.map(_.getDouble(3)).sum >= -1e-4)
  }

  test("ts_holt_linear: level tracks the series and the recursion is exact") {
    val rows = run("ts_holt_linear").collect()
    assert(rows.length >= 28) // ~30-day spine
    // replay the recursion on the collected series: values must be
    // BIT-identical (dyadic alpha=beta=1/2 — no rounding anywhere)
    var l = 0.0; var b = 0.0; var first = true
    rows.foreach { r =>
      val y = r.getDouble(1)
      if (first) { l = y; b = 0.0; first = false }
      else { val lN = (y + (l + b)) / 2; b = ((lN - l) + b) / 2; l = lN }
      assert(r.getDouble(2) == l && r.getDouble(3) == b,
        s"recursion mismatch at ${r.get(0)}")
      assert(r.getDouble(4) == l + b)
    }
  }

  test("window_bollinger_bands: bands bracket the mid, breakouts exact") {
    run("window_bollinger_bands").collect().foreach { r =>
      val (price, mid) = (r.getDouble(2), r.getDouble(3))
      val (up, lo) = (r.getDouble(4), r.getDouble(5))
      assert(lo <= mid && mid <= up)
      if (r.getBoolean(6)) assert(price > up - 1e-6 || price < lo + 1e-6)
    }
  }

  test("pipeline_length_buckets conserves docs and tokens") {
    val rows = run("pipeline_length_buckets").collect()
    val docs = T.t(s, sf, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val totalToks = docs.select(sum(size(split(col("text"), " "))))
      .collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalToks)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
    }
  }

  test("agg_share_of_parent: shares sum to ~1 within each level") {
    val rows = run("agg_share_of_parent").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getDouble(2)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"nation shares sum $s")
    }
    val regionShares = rows.groupBy(_.getString(0))
      .map(_._2.head.getDouble(3)).sum
    assert(math.abs(regionShares - 1.0) < 1e-4)
  }

  test("dq_freshness_sla: head type is fresh with zero staleness") {
    val rows = run("dq_freshness_sla").collect()
    assert(rows.length == 5)
    assert(rows.exists(r => r.getLong(2) == 0L && r.getString(3) == "fresh"))
    rows.foreach(r => assert(r.getLong(2) >= 0))
  }

  test("ml_auc_roc: AUC bounded, Gini consistent, counts conserve events") {
    val rows = run("ml_auc_roc").collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      total += r.getLong(1) + r.getLong(2)
      val (auc, gini) = (r.getDouble(3), r.getDouble(4))
      assert(auc >= 0.0 && auc <= 1.0, s"auc out of range: $auc")
      // both rounded independently from the same exact rational
      assert(math.abs(gini - (2 * auc - 1)) < 3e-6, s"gini $gini vs auc $auc")
    }
    assert(total == T.t(s, sf, "events").count())
  }

  test("join_ip_prefix_lookup: one row per user, LPM invariants hold") {
    val rows = run("join_ip_prefix_lookup").collect()
    val nUsers = T.t(s, sf, "events").select("user_id").distinct().count()
    assert(rows.length == nUsers)
    rows.foreach { r =>
      val (ip, plen, rule) = (r.getLong(1), r.getInt(2), r.getString(3))
      assert(Set(0, 8, 16, 24).contains(plen))
      if (plen == 0) assert(rule == "default")
      else assert(rule.startsWith(s"r$plen-"))
      // an /8 rule exists for every even first octet, so an even-o1 IP can
      // never fall through to the default route
      val o1 = ip / 16777216
      if (o1 % 2 == 0) assert(plen >= 8, s"even o1=$o1 got default route")
    }
  }

  test("text_kl_divergence: top-10 per source, non-increasing contributions") {
    val rows = run("text_kl_divergence").collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.length <= 10)
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to byRank.length).toSeq)
      val contribs = byRank.map(_.getDouble(4)).toSeq
      contribs.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b, s"$src contributions not sorted")
        case _ =>
      }
    }
  }

  test("agg_histogram_log2: buckets conserve orders, shares sum to 1") {
    val rows = run("agg_histogram_log2").collect()
    assert(rows.map(_.getLong(3)).sum == T.t(s, sf, "orders").count())
    rows.foreach { r =>
      assert(r.getLong(2) == (1L << r.getInt(1)), "lo_cents != 2^bucket")
    }
    rows.groupBy(_.getString(0)).foreach { case (pri, rs) =>
      val sumShare = rs.map(_.getDouble(4)).sum
      assert(math.abs(sumShare - 1.0) < 1e-4, s"$pri shares sum $sumShare")
    }
  }

  test("dedup_simhash_recall_audit: counts consistent with the graded keys") {
    val r = run("dedup_simhash_recall_audit").collect().head
    val (nTruth, nCand, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nHit <= math.min(nTruth, nCand))
    // cross-key conservation: the audit's sets ARE the graded keys' outputs
    assert(nCand == run("dedup_simhash").count())
    assert(nTruth == run("dedup_ngram_jaccard").count())
    if (nTruth > 0) {
      val rec = r.getDouble(3)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    if (nCand > 0) {
      val prec = r.getDouble(4)
      assert(prec >= 0.0 && prec <= 1.0)
    }
  }

  test("stat_cohens_kappa: kappa consistent with po/pe, all bounded") {
    val r = run("stat_cohens_kappa").collect().head
    val (po, pe, k) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(po >= 0.0 && po <= 1.0)
    assert(pe > 0.0 && pe < 1.0)
    assert(k <= 1.0 && k >= -1.0)
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-4,
      s"kappa $k vs (po-pe)/(1-pe) ${(po - pe) / (1 - pe)}")
  }

  test("graph_hits_hubs: scores normalized to [0,1] with unit maxima") {
    val rows = run("graph_hits_hubs").collect()
    assert(rows.length == T.t(s, sf, "nation").count())
    val hubs = rows.map(_.getDouble(1))
    val auths = rows.map(_.getDouble(2))
    (hubs ++ auths).foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(hubs.max == 1.0, "max hub not normalized to 1")
    assert(auths.max == 1.0, "max auth not normalized to 1")
  }

  test("stat_ljung_box: Q non-negative over the full day spine") {
    val r = run("stat_ljung_box").collect().head
    assert(r.getLong(0) == 30, "expected the 30-day fixture spine")
    assert(r.getDouble(1) >= 0.0)
  }

  test("window_kaplan_meier: survival curve monotone, risk sets decreasing") {
    val rows = run("window_kaplan_meier").collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), "n_risk < deaths")
      val sv = r.getDouble(4)
      assert(sv >= 0.0 && sv <= 1.0)
    }
    rows.map(_.getDouble(4)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-9, "survival increased")
      case _ =>
    }
    rows.map(_.getLong(1)).sliding(2).foreach {
      case Array(a, b) => assert(a > b, "risk set did not shrink")
      case _ =>
    }
    // first step: S = (n-d)/n
    val h = rows.head
    val expect = (h.getLong(1) - h.getLong(2)).toDouble / h.getLong(1)
    assert(math.abs(h.getDouble(4) - expect) < 1e-5)
  }

  test("etl_manifest_prune_audit: stats conserve rows, prune flag honest") {
    val rows = run("etl_manifest_prune_audit").collect()
    assert(rows.map(_.getLong(1)).sum == T.t(s, sf, "orders").count())
    rows.foreach { r =>
      val (mn, mx, pruned) = (r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(mn <= mx)
      assert(pruned == (mx < 5000000L || mn > 20000000L))
    }
  }

  test("ml_threshold_sweep: winner's F1 reproduces from raw counts") {
    val r = run("ml_threshold_sweep").collect().head
    val thresh = r.getDouble(0)
    val (tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3))
    val e = T.t(s, sf, "events")
    val tp2 = e.filter(col("event_type") === "purchase" &&
      col("value") >= thresh).count()
    val fp2 = e.filter(col("event_type") =!= "purchase" &&
      col("value") >= thresh).count()
    val fn2 = e.filter(col("event_type") === "purchase" &&
      col("value") < thresh).count()
    assert((tp, fp, fn) == ((tp2, fp2, fn2)), "confusion counts drifted")
    val f1 = r.getDouble(4)
    assert(math.abs(f1 - 2.0 * tp / (2.0 * tp + fp + fn)) < 2e-6)
  }

  test("ml_knn_loocv: accuracy bounded, eval slice fully covered") {
    val rows = run("ml_knn_loocv").collect()
    val nEval = T.t(s, sf, "embeddings")
      .filter(col("vec_id") % 10 === 0).count()
    assert(rows.map(_.getLong(1)).sum == nEval)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("stat_fleiss_kappa: kappa consistent with po/pe") {
    val r = run("stat_fleiss_kappa").collect().head
    val (po, pe, k) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(po >= 0.0 && po <= 1.0)
    assert(pe > 0.0 && pe < 1.0)
    assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-4)
  }

  test("catalog_histogram_join_estimate: truth conserved, error signs honest") {
    val rows = run("catalog_histogram_join_estimate").collect()
    val joined = T.t(s, sf, "lineitem")
      .join(T.t(s, sf, "part"), col("l_partkey") === col("p_partkey")).count()
    assert(rows.map(_.getLong(6)).sum == joined)
    rows.foreach { r =>
      assert(r.getLong(5) >= 0)
      if (!r.isNullAt(7)) {
        val err = r.getDouble(7)
        if (r.getLong(5) > r.getLong(6)) assert(err >= 0.0)
        if (r.getLong(5) < r.getLong(6)) assert(err <= 0.0)
      }
    }
  }

  test("ts_peak_detection: strict peaks are non-adjacent with height >= 1") {
    val rows = run("ts_peak_detection").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(3) >= 1, "peak height < 1"))
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate.toEpochDay).sorted
      days.sliding(2).foreach {
        case Array(a, b) => assert(b - a >= 2, "adjacent strict peaks")
        case _ =>
      }
    }
  }

  test("ml_pca_power_iteration: unit-normalized dominant direction") {
    val rows = run("ml_pca_power_iteration").collect()
    assert(rows.length == 64)
    val ws = rows.map(_.getDouble(1))
    ws.foreach(w => assert(w >= -1.0 && w <= 1.0))
    assert(ws.map(math.abs).max == 1.0, "max |component| not normalized")
  }

  test("graph_walk_corpus: every hop is a real edge or a dead-end hold") {
    val rows = run("graph_walk_corpus").collect()
    val nNations = T.t(s, sf, "nation").count().toInt
    assert(rows.length == nNations * 3 * 6)
    val e = T.t(s, sf, "lineitem").select("l_orderkey", "l_suppkey")
      .join(T.t(s, sf, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(T.t(s, sf, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(T.t(s, sf, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey"), col("s_nationkey")).distinct()
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toSet
    val outNodes = e.map(_._1)
    rows.groupBy(r =>
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .foreach { case (k, rs) =>
      val path = rs.sortBy(_.getInt(2)).map(_.getAs[Number](3).longValue)
      assert(path.head == k._1, "walk must start at its start node")
      path.sliding(2).foreach {
        case Array(a, b) =>
          assert(e.contains((a, b)) || (a == b && !outNodes.contains(a)),
            s"hop $a->$b is neither an edge nor a dead-end hold")
        case _ =>
      }
    }
  }

  test("text_ngram_novelty: first doc fully novel, novelty conserved") {
    val rows = run("text_ngram_novelty").collect()
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    val firstDoc = rows.map(_.getLong(0)).min
    assert(byDoc(firstDoc).getDouble(3) == 1.0, "first doc must be all-novel")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val nv = r.getDouble(3)
      assert(nv >= 0.0 && nv <= 1.0)
    }
    // every distinct shingle is first-seen exactly once (independent
    // recompute of the 3-token shingle vocabulary)
    val totalNew = rows.map(_.getLong(2)).sum
    val distinctShingles = T.t(s, sf, "documents")
      .select(explode(expr(
        """transform(sequence(0, size(split(text, ' ')) - 3),
          |  i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"""
          .stripMargin)).as("sh"))
      .select("sh").distinct().count()
    assert(totalNew == distinctShingles)
  }

  test("etl_clustering_depth_audit: clustered layout beats scattered") {
    val rows = run("etl_clustering_depth_audit").collect()
    val byLayout = rows.map(r => r.getString(0) -> r).toMap
    val ck = byLayout("custkey")
    val dt = byLayout("date")
    assert(ck.getDouble(3) < dt.getDouble(3),
      "custkey layout should audit shallower than date layout")
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 1.0)
    }
  }

  test("ml_logreg_newton_step: coefficients finite, corpus conserved") {
    val r = run("ml_logreg_newton_step").collect().head
    assert(r.getLong(0) == T.t(s, sf, "events").count())
    Seq(1, 2, 3).foreach { i =>
      val b = r.getDouble(i)
      assert(!b.isNaN && !b.isInfinite && math.abs(b) < 10.0,
        s"beta$i out of sane range: $b")
    }
  }

  test("etl_shard_rebalance_plan: moves conserve surplus and deficit") {
    val moves = run("etl_shard_rebalance_plan").collect()
    assert(moves.nonEmpty, "length-bucketed shards must be imbalanced")
    moves.foreach { m =>
      assert(m.getLong(2) > 0)
      assert(m.getLong(0) != m.getLong(1))
    }
    // recompute sizes/targets independently
    val sizes = T.t(s, sf, "documents")
      .groupBy(least(expr("n_chars div 40"), lit(15L)).as("shard")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val total = sizes.map(_._2).sum
    val nSh = sizes.length
    val targets = sizes.zipWithIndex.map { case ((sh, sz), idx) =>
      sh -> (total / nSh + (if (idx < total % nSh) 1L else 0L))
    }.toMap
    val sizeMap = sizes.toMap
    val outBy = moves.groupBy(_.getLong(0))
      .map { case (k, ms) => k -> ms.map(_.getLong(2)).sum }
    val inBy = moves.groupBy(_.getLong(1))
      .map { case (k, ms) => k -> ms.map(_.getLong(2)).sum }
    sizeMap.foreach { case (sh, sz) =>
      val net = outBy.getOrElse(sh, 0L) - inBy.getOrElse(sh, 0L)
      assert(sz - net == targets(sh), s"shard $sh not leveled: $sz - $net")
    }
  }

  test("stat_poisson_two_rate: exposures cover the window, counts conserve") {
    val r = run("stat_poisson_two_rate").collect().head
    assert(r.getLong(1) + r.getLong(3) == 30, "weekday+weekend days != 30")
    val purchases = T.t(s, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(r.getLong(0) + r.getLong(2) == purchases)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
  }

  test("window_rolling_p95: matches a recomputed frame selection") {
    val rows = run("window_rolling_p95").collect()
    assert(rows.nonEmpty)
    // independent recompute for supplier 1: sort its rows the same way,
    // then check each emitted p95 is the 19th-smallest of its 20-row frame
    val series = T.t(s, sf, "lineitem").filter(col("l_suppkey") === 1)
      .select((col("l_extendedprice").cast(T.dec) * 100).cast("long").as("c"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "c")
      .collect().map(_.getLong(0))
    val bySupp = rows.filter(_.getAs[Number](0).longValue == 1L)
    assert(bySupp.length == math.max(0, series.length - 19))
    bySupp.take(50).foreach { r =>
      val rn = r.getLong(1).toInt
      val frame = series.slice(rn - 20, rn).sorted
      assert(r.getLong(2) == frame(18), s"rn=$rn p95 mismatch")
    }
  }

  test("text_term_dispersion: non-negative, ranked sequentially") {
    val rows = run("text_term_dispersion").collect()
    assert(rows.length <= 100)
    assert(rows.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("etl_snapshot_expire_plan: policy classes are coherent") {
    val rows = run("etl_snapshot_expire_plan").collect()
    val actions = rows.map(r => r.getInt(0) -> r.getString(2))
    assert(actions.count(_._2 == "recent") == 6)
    // the 6 most recent months are exactly the 'recent' class
    val sorted = rows.sortBy(-_.getInt(0))
    assert(sorted.take(6).forall(_.getString(2) == "recent"))
    // every year's chronologically-first snapshot is never 'expire'
    rows.groupBy(_.getInt(0) / 100).foreach { case (_, ys) =>
      val first = ys.minBy(_.getInt(0))
      assert(first.getString(2) != "expire")
    }
  }

  test("stat_wilson_ci: interval brackets the point estimate") {
    val rows = run("stat_wilson_ci").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo >= 0.0 && hi <= 1.0)
      assert(lo <= p + 1e-9 && p <= hi + 1e-9)
    }
  }

  test("join_bloom_fp_audit: rate bounded and filter not degenerate") {
    val r = run("join_bloom_fp_audit").collect().head
    val (nProbes, nPass, bits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nProbes == 2000)
    assert(nPass <= nProbes)
    assert(bits > 0 && bits <= 131072)
    val fp = r.getDouble(3)
    // with m = 2^17 and n ≤ ~10k build keys, theory puts fp well under 10%
    assert(fp >= 0.0 && fp < 0.1, s"fp rate implausible: $fp")
  }

  test("scalar_uuid_funcs: stable well-formed ids, version/variant pinned") {
    val rows = run("scalar_uuid_funcs").collect()
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$".r
    val ids = rows.map(_.getString(1))
    ids.foreach(u => assert(re.matches(u), s"malformed uuid $u"))
    assert(ids.distinct.length == ids.length, "uuid collision")
    rows.foreach { r =>
      assert(r.getString(2) == "4" && r.getString(3) == "8")
      assert(r.getInt(4) >= 0 && r.getInt(4) < 16)
    }
  }

  test("scalar_geohash_funcs: interleave round-trips exactly") {
    val rows = run("scalar_geohash_funcs").collect()
    assert(rows.nonEmpty)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toSet
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(1), "lon round-trip failed")
      assert(r.getLong(5) == r.getLong(2), "lat round-trip failed")
      val gh = r.getString(3)
      assert(gh.length == 6 && gh.forall(alphabet.contains))
    }
  }

  test("pipeline_sequence_pack conserves tokens and doc counts per source") {
    val rows = run("pipeline_sequence_pack").collect()
    assert(rows.nonEmpty)
    val docs = T.t(s, sf, "documents")
    val nDocs = docs.count()
    val nToks = docs.select(sum(size(split(col("text"), " ")))).collect()
      .head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nDocs, "doc count not conserved")
    assert(rows.map(_.getLong(3)).sum == nToks, "token mass not conserved")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2), "straddle exceeds docs")
      assert(r.getLong(1) >= 0L)
    }
  }

  test("ml_markov_transitions rows are probabilities summing to ~1 per src") {
    val rows = run("ml_markov_transitions").collect()
    assert(rows.nonEmpty)
    val ev = T.t(s, sf, "events")
    val nPairs = ev.count() - ev.select(countDistinct("user_id")).collect()
      .head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nPairs, "pair count != N - users")
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val tot = rs.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-5 * rs.length, s"$src rows sum to $tot")
    }
  }

  test("window_vwap_running final row matches the whole-history ratio") {
    val rows = run("window_vwap_running").collect()
    assert(rows.nonEmpty)
    // last row per part carries the full-history VWAP; recompute exactly
    val byPart = rows.groupBy(_.getLong(0))
    val expected = T.t(s, sf, "lineitem").filter(col("l_partkey") < 100)
      .groupBy("l_partkey")
      .agg(T.r6("cast(sum(cast(round(l_quantity*100) as bigint) * " +
        "cast(round(l_extendedprice*100) as bigint)) as decimal(38,0))",
        "100 * sum(cast(round(l_quantity*100) as bigint))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byPart.foreach { case (pk, rs) =>
      val last = rs.last // rows arrive ordered by the query's total sort
      assert(last.getDouble(4) == expected(pk),
        s"part $pk: ${last.getDouble(4)} != ${expected(pk)}")
    }
  }

  test("stat_kruskal_wallis is non-negative and conserves the sample") {
    val r = run("stat_kruskal_wallis").collect().head
    val n = T.t(s, sf, "events").filter(col("user_id") < 50).count()
    assert(r.getLong(0) == n, "n_total mismatch")
    assert((1 to 5).map(r.getLong).sum == n, "group sizes don't sum to N")
    assert(r.getDouble(6) >= 0.0, "H is a sum of squares — must be >= 0")
  }

  test("ts_sax_words: one word per type, alphabet bounded, segments = days") {
    val rows = run("ts_sax_words").collect()
    assert(rows.length == 5)
    val nDays = T.t(s, sf, "events")
      .select(countDistinct(to_date(col("ts")))).collect().head.getLong(0)
    rows.foreach { r =>
      val word = r.getString(1)
      assert(word.length == r.getLong(2), "word length != segment count")
      assert(r.getLong(2) == nDays, "segments != distinct days")
      assert(word.forall("abcd".contains(_)), s"bad alphabet: $word")
      // rank-selected quartile fences put >= n/4 of the mass at or below
      // each letter boundary: every letter must appear in a 30-seg series
      assert("abcd".forall(word.contains(_)), s"degenerate binning: $word")
    }
  }

  test("text_rake_keywords: degree >= freq, stopwords excluded, 20 rows") {
    val rows = run("text_rake_keywords").collect()
    assert(rows.length == 20)
    val stop = Set("the", "a", "and", "of", "in", "to")
    rows.foreach { r =>
      assert(!stop.contains(r.getString(0)))
      // every phrase containing the word has length >= 1 occurrence of it
      assert(r.getLong(2) >= r.getLong(1), "degree < freq impossible")
      assert(r.getDouble(3) >= 1.0, "score = deg/freq >= 1 by construction")
    }
  }

  test("agg_heavy_change_topk conserves totals and orders by delta") {
    val rows = run("agg_heavy_change_topk").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(3) ==
      math.abs(r.getLong(1) - r.getLong(2))))
    val deltas = rows.map(_.getLong(3)).toSeq
    assert(deltas == deltas.sorted.reverse, "not ordered by delta desc")
  }

  test("scalar_luhn_check: validity matches an independent Luhn fold") {
    val rows = run("scalar_luhn_check").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pan = r.getString(1)
      assert(pan.length == 16 && pan.head == '4' && pan.forall(_.isDigit))
      val sum = pan.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 0) { val x = 2 * d; if (x > 9) x - 9 else x } else d
      }.sum
      assert(r.getLong(2) == sum, s"luhn sum mismatch for $pan")
      assert(r.getBoolean(3) == (sum % 10 == 0))
    }
  }

  test("agg_pareto_abc partitions each brand's revenue into A>=B-share order") {
    val rows = run("agg_pareto_abc").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (brand, rs) =>
      val shares = rs.map(r => r.getString(1) -> r.getDouble(4)).toMap
      val total = shares.values.sum
      assert(math.abs(total - 1.0) < 1e-5, s"$brand shares sum to $total")
      // the A class holds at least as much share as B by construction
      for (a <- shares.get("A"); b <- shares.get("B")) assert(a >= b)
      // parts conserve within the brand
      val nParts = T.t(s, sf, "lineitem")
        .join(T.t(s, sf, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand)
        .select(countDistinct("l_partkey")).collect().head.getLong(0)
      assert(rs.map(_.getLong(2)).sum == nParts)
    }
  }

  test("window_rfm_segments covers every ordered customer exactly once") {
    val rows = run("window_rfm_segments").collect()
    assert(rows.nonEmpty)
    val nCust = T.t(s, sf, "orders").select(countDistinct("o_custkey"))
      .collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nCust)
    rows.foreach { r =>
      val seg = r.getString(1)
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '5'),
        s"bad segment $seg")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("window_cohort_ltv curves are nondecreasing in age per cohort") {
    val rows = run("window_cohort_ltv").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getInt(1))
      val curve = byAge.map(_.getDouble(3))
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        "cumulative revenue decreased")
      // ltv = cum / users is also nondecreasing (users fixed per cohort)
      val ltv = byAge.map(_.getDouble(4))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a })
    }
  }

  test("agg_assoc_rules_lift emits both directions with bounded confidence") {
    val rows = run("agg_assoc_rules_lift").collect()
    assert(rows.length == 40)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 40, "duplicate rules")
    rows.foreach { r =>
      assert(pairs.contains((r.getLong(1), r.getLong(0))),
        "missing reverse direction")
      val conf = r.getDouble(3)
      assert(conf > 0.0 && conf <= 1.0, s"conf out of range: $conf")
      assert(r.getDouble(4) > 0.0, "lift must be positive")
    }
  }

  test("ts_stl_decompose reassembles exactly: trend+seasonal+resid == x") {
    val rows = run("ts_stl_decompose").collect()
    assert(rows.nonEmpty)
    // recompute the daily series to compare against the reassembly
    val daily = T.t(s, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 100).cast("long")).cast("double") / 100.0)
        .as("x"))
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val x = daily(r.getDate(0).toString)
      val re = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(re - x) < 5e-6, s"day ${r.getDate(0)}: $re != $x")
    }
  }

  test("window_rolling_mad: mad is zero on first rows, bounded by spread") {
    val rows = run("window_rolling_mad").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      assert(r.getDouble(2) >= 0.0, "median of nonneg values is nonneg")
    }
    // a user's first event has a singleton frame: MAD must be exactly 0
    val firstPerUser = rows.groupBy(_.getLong(1))
      .map { case (_, rs) => rs.minBy(_.getLong(0)) }
    // not all "first rows in output" are the user's true first event
    // (limit 2000 by event_id), so only assert when event_id is globally
    // minimal for that user within the output — weak but real invariant:
    assert(firstPerUser.nonEmpty)
  }

  test("stat_cvm_two_sample is in the valid range for the midrank variant") {
    val r = run("stat_cvm_two_sample").collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val t = r.getDouble(2)
    // T >= -1/(6N) (exact lower bound ~0) and bounded above by ~N/6
    assert(t > -0.01 && t < (r.getLong(0) + r.getLong(1)) / 6.0,
      s"implausible CvM statistic: $t")
  }

  test("ts_rescaled_range: R/S within [sqrt-bound] for n daily points") {
    val rows = run("ts_rescaled_range").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getLong(1)
      val rs = r.getDouble(2)
      // R/S of any length-n series is positive and cannot exceed n
      // (range of mean-centered partial sums is at most n·sigma)
      assert(rs > 0.0 && rs <= n.toDouble,
        s"${r.getString(0)}: R/S $rs outside (0, $n]")
    }
  }

  test("graph_katz_centrality: scores positive, ordered, degree-consistent") {
    val rows = run("graph_katz_centrality").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse, "not ordered by score desc")
    // with v0 = 1e6 and beta = 1/4, a node of degree d has v1 = d*250000:
    // every katz score is at least its first step, hence >= 250000
    scores.foreach(v => assert(v >= 250000L, s"implausible katz $v"))
  }

  test("agg_time_decay_engagement: decayed score never exceeds raw sum") {
    val rows = run("agg_time_decay_engagement").collect()
    assert(rows.nonEmpty)
    val raw = T.t(s, sf, "events").groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val u = r.getLong(0)
      assert(r.getLong(2) <= raw(u), s"user $u: decayed > raw")
      assert(r.getLong(2) >= 0L)
    }
  }

  test("scalar_base58_funcs: codes round-trip and use the base58 alphabet") {
    val rows = run("scalar_base58_funcs").collect()
    assert(rows.nonEmpty)
    val alpha =
      "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz".toSet
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1), "decode != original value")
      val code = r.getString(2)
      assert(code.length == 8 && code.forall(alpha.contains), s"bad $code")
    }
    assert(rows.map(_.getString(2)).distinct.length == rows.length)
  }

  test("stat_jarque_bera: JB nonnegative and consistent with skew/kurt") {
    val rows = run("stat_jarque_bera").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, sk, ku, jb) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(jb >= 0.0)
      val expect = n / 6.0 * (sk * sk + ku * ku / 4)
      // jb was computed from UNROUNDED sk/ku, so allow rounding slack
      assert(math.abs(jb - expect) < 0.05 * math.max(1.0, expect),
        s"${r.getString(0)}: jb $jb vs recomposed $expect")
    }
  }

  test("agg_hhi_concentration lies in (1/n, 1] per nation") {
    val rows = run("agg_hhi_concentration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val hhi = r.getDouble(2)
      assert(hhi > 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6,
        s"nation ${r.get(0)}: HHI $hhi outside (1/$n, 1]")
    }
  }

  test("ml_conformal_interval: coverage near the 0.9 conformal target") {
    val rows = run("ml_conformal_interval").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val cov = r.getDouble(5)
      // finite-sample guarantee: coverage ≥ 0.9 in expectation; allow
      // sampling noise around the target on a few hundred test points
      assert(cov > 0.8 && cov <= 1.0,
        s"${r.getString(0)}: coverage $cov far from 0.9")
      assert(r.getDouble(4) > 0.0, "width must be positive")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
    }
  }

  test("text_simpson_diversity bounded and richness <= tokens") {
    val rows = run("text_simpson_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "richness > token count")
      val d = r.getDouble(3)
      assert(d >= 0.0 && d <= 1.0, s"Simpson D out of [0,1]: $d")
    }
  }

  test("window_conversion_latency quantiles are ordered") {
    val r = run("window_conversion_latency").collect().head
    assert(r.getLong(0) > 0, "no converting users")
    val qs = (1 to 4).map(r.getLong)
    assert(qs == qs.sorted, s"quantiles out of order: $qs")
    assert(qs.head >= 0L)
  }

  test("text_js_divergence is within [0, ln 2] as JS must be") {
    val r = run("text_js_divergence").collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val js = r.getDouble(2)
    assert(js >= -1e-6 && js <= math.log(2.0) + 1e-6,
      s"JS divergence $js outside [0, ln2]")
  }

  test("stat_permutation_test: p-value in (0,1], floor 1/(B+1)") {
    val r = run("stat_permutation_test").collect().head
    val p = r.getDouble(3)
    assert(p >= 1.0 / 201 - 1e-6 && p <= 1.0, s"p-value $p out of range")
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 200)
  }

  test("stat_permutation_test: collapsed n_extreme equals the literal 200-way") {
    // ADVICE r16: the shipped ×200→×1 collapse is only valid because the
    // hash constants are odd and hash32's hi term is a multiple of 2^16
    // (side(k,b) = (k&1) XOR (b&1), and the extremeness inequality is
    // side-swap-invariant). Pin the equality against the LITERAL 200-way
    // computation so changing any hash constant fails fast in CI instead
    // of only at oracle time.
    val e = T.t(s, sf, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("y"),
        when(col("event_type") === "purchase", 1).otherwise(2).as("grp"))
    val b = s.range(1, 201).select(col("id").as("b"))
    val perms = e.crossJoin(b)
      .withColumn("so",
        T.hash32(col("event_id"), 2654435761L, col("b") * 40503L) % 2)
      .groupBy("b").agg(
        sum(when(col("so") === 0, col("y")).otherwise(0L)).as("s1b"),
        sum(when(col("so") === 0, 1L).otherwise(0L)).as("n1b"),
        sum(when(col("so") === 1, col("y")).otherwise(0L)).as("s2b"),
        sum(when(col("so") === 1, 1L).otherwise(0L)).as("n2b"))
    val obs = e.agg(
      sum(when(col("grp") === 1, col("y")).otherwise(0L)).as("s1"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("grp") === 2, col("y")).otherwise(0L)).as("s2"),
      sum(when(col("grp") === 2, 1L).otherwise(0L)).as("n2"))
    val literal = perms.crossJoin(obs)
      .filter(col("n1b") > 0 && col("n2b") > 0 &&
        expr("abs(cast(s1b as decimal(38,0)) * n2b" +
          " - cast(s2b as decimal(38,0)) * n1b) * (n1 * n2) >= " +
          "abs(cast(s1 as decimal(38,0)) * n2" +
          " - cast(s2 as decimal(38,0)) * n1) * (n1b * n2b)"))
      .count()
    val shipped = run("stat_permutation_test").collect().head.getLong(2)
    assert(shipped == literal,
      s"collapsed n_extreme $shipped != literal 200-way $literal")
  }

  test("agg_topn_other_rollup: exactly 5 named + Other, shares sum to 1") {
    val rows = run("agg_topn_other_rollup").collect()
    assert(rows.length == 6)
    assert(rows.count(_.getString(0) == "Other") == 1)
    val otherRow = rows.find(_.getString(0) == "Other").get
    assert(rows.filter(_.getString(0) != "Other").forall(_.getLong(1) == 1))
    val total = rows.map(_.getDouble(3)).sum
    assert(math.abs(total - 1.0) < 1e-5, s"shares sum to $total")
    // each named top-5 brand individually outweighs no other named below it
    val named = rows.filter(_.getString(0) != "Other").map(_.getLong(2)).toSeq
    assert(named == named.sorted.reverse, "top-5 not revenue-ordered")
    assert(otherRow.getLong(1) > 1, "Other must absorb the tail")
  }

  test("ts_velocity_accel: differences telescope back to the series") {
    val rows = run("ts_velocity_accel").collect().sortBy(_.getDate(0).getTime)
    assert(rows.length >= 3)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == b.getLong(1) - a.getLong(1), "dx mismatch")
      if (!a.isNullAt(2))
        assert(b.getLong(3) == b.getLong(2) - a.getLong(2), "d2x mismatch")
    }
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3))
  }

  test("window_time_in_state shares sum to 1 and minutes are plausible") {
    val rows = run("window_time_in_state").collect()
    assert(rows.length == 5)
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - 1.0) < 1e-5, s"shares sum to $total")
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("ml_pinball_loss_eval: p50 <= p90 and losses positive") {
    val rows = run("ml_pinball_loss_eval").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "p50 > p90 impossible")
      assert(r.getDouble(4) > 0.0 && r.getDouble(5) > 0.0)
      // the 0.9-quantile pinball loss is smaller than the median's for
      // right-skewed nonneg data only sometimes — don't over-assert
    }
  }

  test("ml_learning_curve: nested training sets grow, accuracy bounded") {
    val rows = run("ml_learning_curve").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(0)).toSeq == Seq(25L, 50L, 75L, 100L))
    val sizes = rows.map(_.getLong(1)).toSeq
    assert(sizes == sizes.sorted, "train sizes must be nested/increasing")
    rows.foreach { r =>
      val acc = r.getDouble(3)
      assert(acc > 0.0 && acc <= 1.0)
    }
    // all rows score the same test set
    assert(rows.map(_.getLong(2)).distinct.length == 1)
  }

  test("agg_aging_buckets: shares sum to 1, orders conserved") {
    val rows = run("agg_aging_buckets").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - 1.0) < 1e-5, s"shares sum to $total")
    val nOrders = T.t(s, sf, "lineitem")
      .select(countDistinct("l_orderkey")).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == nOrders)
  }

  test("stat_qq_deciles: both sides monotone nondecreasing over deciles") {
    val rows = run("stat_qq_deciles").collect().sortBy(_.getLong(0))
    assert(rows.length == 9)
    Seq(1, 2).foreach { c =>
      val v = rows.map(_.getLong(c)).toSeq
      assert(v == v.sorted, s"column $c not monotone: $v")
    }
    rows.foreach(r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), "gap mismatch"))
  }

  test("window_zscore_alerts: every alert violates the 3-sigma bound") {
    val rows = run("window_zscore_alerts").collect()
    assert(rows.nonEmpty)
    // re-derive the condition locally per alert: |dev10| must be large
    rows.foreach { r =>
      assert(math.abs(r.getLong(3)) > 0, "zero deviation can't alert")
    }
    // alerts are a small minority of events (3-sigma rule of thumb)
    val total = T.t(s, sf, "events").count()
    assert(rows.length < total / 5, "too many alerts for a 3-sigma gate")
  }

  test("text_vocab_growth: both cumulative curves are nondecreasing") {
    val rows = run("text_vocab_growth").collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    Seq(1, 2).foreach { c =>
      val v = rows.map(_.getLong(c)).toSeq
      assert(v == v.sorted, s"cumulative column $c decreased")
    }
    // vocabulary can never exceed token mass
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("scalar_business_days agrees with an independent calendar walk") {
    val rows = run("scalar_business_days").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d1, d2) = (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate)
      val (lo, hi) = if (d2.isBefore(d1)) (d2, d1) else (d1, d2)
      var d = lo; var n = 0L
      while (d.isBefore(hi)) {
        if (d.getDayOfWeek.getValue <= 5) n += 1
        d = d.plusDays(1)
      }
      val expect = if (d2.isBefore(d1)) -n else n
      assert(r.getLong(4) == expect,
        s"order ${r.getLong(0)}: ${r.getLong(4)} != $expect")
      assert(math.abs(r.getLong(4)) <= math.abs(r.getLong(3)))
    }
  }

  test("graph_harmonic_centrality: ball sizes bounded by graph order") {
    val rows = run("graph_harmonic_centrality").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(4)).toSeq
    assert(scores == scores.sorted.reverse)
    rows.foreach { r =>
      val (n1, n2, n3) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n1 > 0)
      val h = r.getDouble(4)
      val expect = (6 * n1 + 3 * n2 + 2 * n3) / 6.0
      assert(math.abs(h - expect) < 1e-5, s"$h != $expect")
    }
  }

  test("etl_interval_union_coverage: covered <= span, islands <= intervals") {
    val rows = run("etl_interval_union_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "covered days exceed span")
      assert(r.getLong(1) >= 1)
      // every island covers at least 1 day (min interval length is 1)
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("dq_watermark_lateness: 8 shards, counts conserve, rates bounded") {
    val rows = run("dq_watermark_lateness").collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).sum == T.t(s, sf, "events").count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      // a hash-shuffled arrival order must produce substantial lateness
      assert(r.getLong(2) > 0, s"shard ${r.getLong(0)}: no late events " +
        "under a shuffled arrival — hash is not shuffling")
    }
  }

  test("stat_lin_ccc: |CCC| <= 1 and CCC <= Pearson in magnitude sense") {
    val rows = run("stat_lin_ccc").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-6 && c <= 1.0 + 1e-6, s"CCC out of range: $c")
    }
  }

  test("agg_geometric_mean lies between min and arithmetic mean") {
    val rows = run("agg_geometric_mean").collect()
    assert(rows.length == 3)
    val stats = T.t(s, sf, "lineitem").groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("mn"), avg("l_extendedprice").as("am"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (mn, am) = stats(r.getString(0))
      val gm = r.getDouble(2)
      assert(gm >= mn - 1e-3 && gm <= am + 1e-3,
        s"${r.getString(0)}: GM $gm outside [min=$mn, AM=$am]")
    }
  }

  test("window_funnel_time_bound: stage counts only shrink down the funnel") {
    val r = run("window_funnel_time_bound").collect().head
    val (nu, n1, n2, n3) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n1 <= nu && n2 <= n1 && n3 <= n2, s"funnel grows: $nu $n1 $n2 $n3")
    Seq(4, 5).foreach { i =>
      val c = r.getDouble(i)
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("stat_odds_ratio_ci: OR inside its own CI, counts conserve") {
    val r = run("stat_odds_ratio_ci").collect().head
    val total = (0 to 3).map(r.getLong).sum
    assert(total == T.t(s, sf, "lineitem").count())
    val (or, lo, hi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(lo <= or && or <= hi, s"OR $or outside CI [$lo, $hi]")
    assert(lo > 0.0)
  }

  test("pipeline_budget_apportion sums exactly to the 1M budget") {
    val rows = run("pipeline_budget_apportion").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum == 1000000L,
      "largest-remainder allocation must hit the budget exactly")
    // allocation is within 1 seat of the exact proportional quota
    val totTok = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val exact = 1000000.0 * r.getLong(1) / totTok
      assert(math.abs(r.getLong(2) - exact) < 1.0 + 1e-9,
        s"${r.getString(0)}: alloc ${r.getLong(2)} vs quota $exact")
    }
  }

  test("stat_capture_recapture estimates the true population closely") {
    val r = run("stat_capture_recapture").collect().head
    val (n1, n2, m, trueN) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m <= n1 && m <= n2)
    val chapman = r.getDouble(5)
    // with near-complete captures the estimator lands within a few
    // percent of truth — the audit the key exists to demonstrate
    assert(math.abs(chapman - trueN) < 0.1 * trueN,
      s"Chapman $chapman vs true $trueN")
  }

  test("stat_stratified_ate: both estimates bounded, rows conserve") {
    val r = run("stat_stratified_ate").collect().head
    assert(r.getLong(0) > 0)
    Seq(2, 3).foreach { i =>
      val v = r.getDouble(i)
      assert(v >= -1.0 && v <= 1.0, s"rate diff $v out of [-1,1]")
    }
  }

  test("ts_seasonality_strength lies in [0, 1] up to rounding") {
    val r = run("ts_seasonality_strength").collect().head
    val f = r.getDouble(1)
    // F_s = 1 - Var(R)/Var(S+R): can dip slightly below 0 when seasonal
    // and remainder anticorrelate, never above 1
    assert(f <= 1.0 + 1e-6 && f > -0.5, s"implausible strength $f")
    assert(r.getLong(0) > 0)
  }

  test("agg_trimmed_mean sits between the type's p10 and p90") {
    val rows = run("agg_trimmed_mean").collect()
    assert(rows.length == 5)
    val qs = T.t(s, sf, "events").groupBy("event_type")
      .agg(expr("percentile(value, 0.1)").as("p10"),
        expr("percentile(value, 0.9)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (p10, p90) = qs(r.getString(0))
      val tm = r.getDouble(2)
      assert(tm >= p10 - 1e-6 && tm <= p90 + 1e-6,
        s"${r.getString(0)}: trimmed mean $tm outside [$p10, $p90]")
    }
  }

  test("vector_jl_projection_audit: mean distortion near 1 (JL lemma)") {
    val rows = run("vector_jl_projection_audit").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "identical pair degenerate")
      assert(r.getDouble(3) >= 0.0)
    }
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    // E[distortion] = 1; at m=8 the average over 50 pairs concentrates
    assert(mean > 0.5 && mean < 1.6, s"mean distortion $mean far from 1")
  }

  test("ml_expected_calibration_error is a bounded telescoped rational") {
    val r = run("ml_expected_calibration_error").collect().head
    val ece = r.getDouble(2)
    assert(ece >= 0.0 && ece <= 1.0, s"ECE out of [0,1]: $ece")
    assert(r.getLong(0) == T.t(s, sf, "events").count())
  }

  test("window_rolling_beta: full 14-day frames only, finite values") {
    val rows = run("window_rolling_beta").collect()
    assert(rows.nonEmpty)
    val nDays = T.t(s, sf, "events")
      .select(countDistinct(to_date(col("ts")))).collect().head.getLong(0)
    assert(rows.length == nDays - 13, "one row per full 14-day frame")
    rows.foreach(r => assert(!r.getDouble(1).isNaN))
  }

  test("graph_rich_club: phi in [0,1], club sizes shrink with k") {
    val rows = run("graph_rich_club").collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    val nks = rows.map(_.getLong(1)).toSeq
    assert(nks == nks.sorted.reverse, "club must shrink as k grows")
    rows.foreach { r =>
      val phi = r.getDouble(3)
      assert(phi >= 0.0 && phi <= 1.0, s"phi out of range: $phi")
      // edges within the club can't exceed the club's complete graph
      val nk = r.getLong(1)
      assert(2 * r.getLong(2) <= nk * (nk - 1).max(0))
    }
  }

  test("agg_var_cvar: CVaR loss at least the VaR loss (tail mean deeper)") {
    val r = run("agg_var_cvar").collect().head
    assert(r.getLong(0) > 0)
    val varLoss = r.getLong(1) / 100.0
    val cvarLoss = r.getDouble(2)
    assert(cvarLoss >= varLoss - 1e-6,
      s"CVaR $cvarLoss must be at least VaR $varLoss")
  }

  test("stat_kendall_w: W in [0,1] per language") {
    val rows = run("stat_kendall_w").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val w = r.getDouble(2)
      assert(w >= 0.0 && w <= 1.0 + 1e-6, s"${r.getString(0)}: W $w")
      assert(r.getLong(1) > 0)
    }
  }

  test("stat_overdispersion_index: positive mean and dispersion") {
    val r = run("stat_overdispersion_index").collect().head
    assert(r.getLong(0) > 0)
    assert(r.getDouble(1) > 0.0)
    assert(r.getDouble(2) > 0.0)
  }

  test("agg_lorenz_curve: monotone, rev_share <= pop_share, ends at 1") {
    val rows = run("agg_lorenz_curve").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.get(0)).foreach { case (nk, rs) =>
      val byD = rs.sortBy(_.getLong(1))
      val pop = byD.map(_.getDouble(2)).toSeq
      val rev = byD.map(_.getDouble(3)).toSeq
      assert(pop == pop.sorted && rev == rev.sorted, s"nation $nk not monotone")
      byD.foreach(r => assert(r.getDouble(3) <= r.getDouble(2) + 1e-6,
        s"nation $nk: Lorenz curve above the diagonal"))
      assert(math.abs(pop.last - 1.0) < 1e-5)
      assert(math.abs(rev.last - 1.0) < 1e-5)
    }
  }

  test("text_phrase_index_query: index count equals substring count") {
    val r = run("text_phrase_index_query").collect().head
    assert(r.getBoolean(4),
      s"positional-index count ${r.getLong(2)} != substring ${r.getLong(3)}")
    assert(r.getLong(1) <= r.getLong(2), "docs-with cannot exceed hits")
  }

  test("ml_pr_curve_points: recall decreases as the threshold rises") {
    val rows = run("ml_pr_curve_points").collect().sortBy(_.getLong(0))
    assert(rows.length == 9)
    val recalls = rows.map(_.getDouble(5)).toSeq
    assert(recalls == recalls.sorted.reverse, "recall must be nonincreasing")
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("dq_volume_anomaly: alert iff |c - med| > 3*mad, exactly") {
    val rows = run("dq_volume_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = math.abs(r.getLong(1) - r.getLong(2)) > 3 * r.getLong(3)
      assert(r.getBoolean(4) == expect, s"day ${r.getDate(0)}")
    }
  }

  test("stat_chi2_residuals: row pairs cancel (hi ~ -lo) and conserve") {
    val rows = run("stat_chi2_residuals").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(2)).sum == T.t(s, sf, "events").count())
    rows.groupBy(_.getString(0)).foreach { case (g, rs) =>
      assert(rs.length == 2, s"$g missing a bucket")
      // within a 2-column table, the two residuals of a row have equal
      // magnitude and opposite signs (up to rounding)
      val Array(a, b) = rs.map(_.getDouble(3)).sorted
      assert(math.abs(a + b) < 2e-3, s"$g: residuals $a, $b don't cancel")
    }
  }

  test("scalar_slugify emits clean dash-delimited lowercase slugs") {
    val rows = run("scalar_slugify").collect()
    assert(rows.nonEmpty)
    val re = "^[a-z0-9]+(-[a-z0-9]+)*$".r
    rows.foreach { r =>
      val slug = r.getString(2)
      assert(re.matches(slug), s"malformed slug '$slug'")
      assert(r.getLong(3) >= 1)
    }
  }

  test("pipeline_dataset_card: shares bounded, tokens/docs conserve") {
    val rows = run("pipeline_dataset_card").collect()
    assert(rows.nonEmpty)
    val docs = T.t(s, sf, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      Seq(4, 5).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0)
      }
      assert(r.getDouble(3) > 0.0)
    }
    // FIXTURES.md's duplicate texts exist only at sf0.1 — when this
    // corpus carries any, the card must surface a nonzero dup share
    val nDups = docs.count() -
      docs.select(countDistinct(md5(col("text")))).collect().head.getLong(0)
    if (nDups > 0)
      assert(rows.map(_.getDouble(5)).sum > 0.0, "dup share all zero")
  }

  test("stat_cohens_d is small for near-identical distributions") {
    val r = run("stat_cohens_d").collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val d = r.getDouble(2)
    assert(math.abs(d) < 2.0, s"implausible effect size $d")
  }

  test("window_since_last_event: sentinel before purchases, 0 at purchase") {
    val rows = run("window_since_last_event").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, since) = (r.getLong(2), r.getLong(3))
      if (np == 0) assert(since == -1L, "pre-purchase rows carry -1")
      else assert(since >= 0L)
    }
    assert(rows.exists(_.getLong(3) == 0L), "purchase rows restart at 0")
  }

  test("stat_durbin_watson lies in the statistic's [0, 4] range") {
    val r = run("stat_durbin_watson").collect().head
    val dw = r.getDouble(0)
    assert(dw >= 0.0 && dw <= 4.0, s"DW $dw outside [0,4]")
  }

  test("etl_pii_pseudonymize: stable tokens, collision audit green") {
    val rows = run("etl_pii_pseudonymize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1).startsWith("cust-") &&
        r.getString(1).length == 17)
      assert(r.getBoolean(2), "pseudonym collision detected")
    }
    // re-run yields identical tokens (determinism of the pepper hash)
    val again = run("etl_pii_pseudonymize").collect()
    assert(rows.map(_.getString(1)).toSeq == again.map(_.getString(1)).toSeq)
  }

  test("ml_shapley_two_feature satisfies the efficiency axiom exactly") {
    val r = run("ml_shapley_two_feature").collect().head
    val (v0, v12) = (r.getDouble(0), r.getDouble(1))
    val (p1, p2) = (r.getDouble(2), r.getDouble(3))
    assert(math.abs((p1 + p2) - (v12 - v0)) < 2e-6,
      s"phi1+phi2 = ${p1 + p2} != v(full)-v(empty) = ${v12 - v0}")
    assert(v0 >= 0.0 && v0 <= 1.0 && v12 >= 0.0 && v12 <= 1.0)
  }

  test("agg_theil_index nonnegative and below ln(n)") {
    val r = run("agg_theil_index").collect().head
    val t = r.getDouble(1)
    val n = r.getLong(0)
    // the ln quantization can push T a hair below 0 for near-equal
    // distributions; the upper bound ln(n) is exact
    assert(t > -1e-3 && t <= math.log(n.toDouble), s"Theil $t out of range")
  }

  test("stat_mcnemar matches the discordant-count formula") {
    val r = run("stat_mcnemar").collect().head
    val (b, c) = (r.getLong(0), r.getLong(1))
    val chi2 = r.getDouble(2)
    if (b + c > 0) {
      val expect = (b - c).toDouble * (b - c) / (b + c)
      assert(math.abs(chi2 - expect) < 1e-5, s"$chi2 != $expect")
    } else assert(chi2 == 0.0)
  }

  test("agg_nps_score: counts consistent, NPS in [-1, 1]") {
    val r = run("agg_nps_score").collect().head
    val (n, p, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(p + d <= n)
    val nps = r.getDouble(3)
    assert(nps >= -1.0 && nps <= 1.0)
    assert(math.abs(nps - (p - d).toDouble / n) < 1e-5)
  }

  test("stat_pot_gpd_fit: guarded below 10 exceedances, sigma positive") {
    val r = run("stat_pot_gpd_fit").collect().head
    val k = r.getLong(0)
    if (k < 10) {
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    } else {
      assert(r.getDouble(2) > 0.0, "scale must be positive")
      assert(r.getDouble(1) < 0.5, "MoM xi < 1/2 by construction")
    }
  }

  test("ml_gain_lift_chart: gains cumulative, decile 10 captures all") {
    val rows = run("ml_gain_lift_chart").collect().sortBy(_.getLong(0))
    assert(rows.length == 10)
    val gains = rows.map(_.getDouble(3)).toSeq
    assert(gains == gains.sorted, "gain share must be nondecreasing")
    assert(math.abs(gains.last - 1.0) < 1e-5, "final decile captures all")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "positives exceed targeted")
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("ts_mase_naive: MASE equals the ratio of the two MAEs") {
    val r = run("ts_mase_naive").collect().head
    assert(r.getLong(0) > 0)
    val (mae7, mae1, mase) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(mae7 > 0.0 && mae1 > 0.0)
    assert(math.abs(mase - mae7 / mae1) < 1e-4, s"$mase != ${mae7 / mae1}")
  }

  test("stat_hodges_lehmann: pair count is n(n+1)/2 of the delta series") {
    val r = run("stat_hodges_lehmann").collect().head
    val nDays = T.t(s, sf, "events")
      .select(countDistinct(to_date(col("ts")))).collect().head.getLong(0)
    val nd = nDays - 1 // deltas
    assert(r.getLong(0) == nd * (nd + 1) / 2, "Walsh pair count wrong")
    assert(r.getDouble(2) == r.getLong(1) / 200.0)
  }

  test("ml_brier_score lies in [0, 1]") {
    val r = run("ml_brier_score").collect().head
    assert(r.getLong(0) > 0)
    val b = r.getDouble(1)
    assert(b >= 0.0 && b <= 1.0, s"Brier $b out of range")
  }

  test("scalar_iban_mod97 agrees with big-integer modulus") {
    val rows = run("scalar_iban_mod97").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = (BigInt(r.getString(1)) mod BigInt(97)).toLong
      assert(r.getLong(2) == expect, s"mod97 mismatch for ${r.getString(1)}")
      assert(r.getLong(3) == 98 - expect)
    }
  }

  test("graph_degree_gini within [0, 1)") {
    val r = run("graph_degree_gini").collect().head
    assert(r.getLong(0) > 0)
    val g = r.getDouble(1)
    assert(g >= 0.0 && g < 1.0, s"degree gini $g out of range")
  }

  test("agg_abc_xyz_matrix: parts conserve across the 9-cell grid") {
    val rows = run("agg_abc_xyz_matrix").collect()
    assert(rows.nonEmpty)
    val nParts = T.t(s, sf, "lineitem")
      .select(countDistinct("l_partkey")).collect().head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nParts)
    rows.foreach { r =>
      assert(Set("A", "B", "C").contains(r.getString(0)))
      assert(Set("X", "Y", "Z").contains(r.getString(1)))
    }
  }

  test("scalar_semver_funcs: sort key is order-isomorphic to the triple") {
    val rows = run("scalar_semver_funcs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Array(m, n, p) = r.getString(1).split("\\.").map(_.toLong)
      assert(r.getLong(2) == m * 1000000 + n * 1000 + p)
      assert(r.getBoolean(3) == (m >= 1))
    }
  }

  test("stat_u_auc_identity equals an independent pairwise AUC recount") {
    val r = run("stat_u_auc_identity").collect().head
    val data = T.t(s, sf, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(round(col("value") * 100).cast("long").as("y"),
        (col("event_type") === "purchase").as("p"))
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val pos = data.filter(_._2).map(_._1)
    val neg = data.filterNot(_._2).map(_._1)
    var u2 = 0L
    pos.foreach { a =>
      neg.foreach { b =>
        if (a > b) u2 += 2 else if (a == b) u2 += 1
      }
    }
    val expect = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(r.getDouble(2) - expect) < 2e-6,
      s"AUC ${r.getDouble(2)} != pairwise $expect")
  }

  test("agg_growth_price_volume_bridge: pe + ve == delta-R exactly") {
    val rows = run("agg_growth_price_volume_bridge").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dr = (r.getLong(2) - r.getLong(1)) / 100.0
      val sum = r.getDouble(3) + r.getDouble(4)
      assert(math.abs(sum - dr) < 0.01,
        s"${r.getString(0)}: bridge $sum != deltaR $dr")
    }
  }

  test("dedup_cluster_size_histogram conserves the document count") {
    val rows = run("dedup_cluster_size_histogram").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum == T.t(s, sf, "documents").count())
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(2)))
  }

  test("window_new_vs_returning: day one all-new, totals conserve") {
    val rows = run("window_new_vs_returning").collect()
      .sortBy(_.getDate(0).getTime)
    assert(rows.nonEmpty)
    assert(rows.head.getLong(2) == 0L, "first day cannot have returning")
    assert(math.abs(rows.head.getDouble(3) - 1.0) < 1e-6)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == T.t(s, sf, "events").count())
  }

  test("ts_record_highs: records bounded and expectation is H_n") {
    val r = run("ts_record_highs").collect().head
    val (n, rec) = (r.getLong(0), r.getLong(1))
    assert(rec >= 1 && rec <= n, "day one is always a record")
    val hn = (1L to n).map(k => 1000000L / k).sum / 1e6
    assert(math.abs(r.getDouble(2) - hn) < 1e-9)
  }

  test("stat_sign_test: |z| bounded by sqrt(n)") {
    val r = run("stat_sign_test").collect().head
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(k <= n)
    assert(math.abs(r.getDouble(2)) <= math.sqrt(n.toDouble) + 1e-9)
  }

  test("window_wma_triangular tracks the series level") {
    val rows = run("window_wma_triangular").collect()
    assert(rows.nonEmpty)
    val daily = T.t(s, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("x"))
      .collect().map(_.getDouble(1))
    val (mn, mx) = (daily.min, daily.max)
    rows.foreach { r =>
      val w = r.getDouble(1)
      assert(w >= mn - 1e-6 && w <= mx + 1e-6,
        s"WMA $w outside series range [$mn, $mx]")
    }
  }

  test("etl_column_diff_profile matches the synthetic change rule") {
    val rows = run("etl_column_diff_profile").collect()
    assert(rows.length == 3)
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = T.t(s, sf, "orders").select("o_orderkey")
      .collect().map(_.getLong(0))
    assert(m("o_orderpriority") == keys.count(_ % 7 == 0))
    assert(m("o_totalprice") == keys.count(_ % 11 == 0))
    assert(m("o_orderstatus") == 0L)
  }

  test("catalog_predicate_selectivity: conjunction bounded by conjuncts") {
    val rows = run("catalog_predicate_selectivity").collect()
    assert(rows.length == 5)
    val m = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val conj = m("ship1998_and_disc")
    assert(conj <= m("shipdate>=1998") + 1e-9)
    assert(conj <= m("discount>5pct") + 1e-9)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("ml_reciprocal_rank_fusion: fused score consistent with ranks") {
    val rows = run("ml_reciprocal_rank_fusion").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val expect = 1000000000L / (60 + r.getLong(1)) +
        1000000000L / (60 + r.getLong(2))
      assert(r.getLong(3) == expect, "rrf score mismatch")
    }
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("stat_cohens_h within the arcsine range [-pi, pi]") {
    val r = run("stat_cohens_h").collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    val h = r.getDouble(2)
    assert(h >= -math.Pi && h <= math.Pi, s"h $h out of range")
  }

  test("ml_mcc_score: counts conserve, MCC within [-1, 1]") {
    val r = run("ml_mcc_score").collect().head
    assert((0 to 3).map(r.getLong).sum == T.t(s, sf, "events").count())
    val mcc = r.getDouble(4)
    assert(mcc >= -1.0 && mcc <= 1.0, s"MCC $mcc out of range")
  }

  test("scalar_phone_normalize: E.164 digits only, deterministic") {
    val rows = run("scalar_phone_normalize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getString(2)
      assert(e.head == '+' && e.tail.forall(_.isDigit), s"bad E.164 $e")
      assert(r.getBoolean(3) == (e.length == 12))
      assert(e == "+" + r.getString(1).filter(_.isDigit))
    }
  }

  test("round-10 keys are deterministic under repartitioning") {
    // the three keys whose determinism depends on hash-ordering rather
    // than a natural sort: re-run and compare full collected output
    Seq("pipeline_sample_temperature", "stat_bootstrap_ci", "vector_recall_at_k")
      .foreach { key =>
        val a = run(key).collect().map(_.toString).toSeq
        val b = run(key).collect().map(_.toString).toSeq
        assert(a == b, s"$key nondeterministic")
      }
  }
}
