package graft

import org.apache.spark.sql.functions.col

/** Structural invariants of the round-8 query tranche that the oracle's
  * value-hash can't express: decomposition identities, policy-replay
  * sanity bounds, coverage-assignment totals. Runs on the sf0.001
  * fixture like the smoke tier.
  */
class QueryInvariantsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf("sf0.001")).collect()

  test("events_stl_decompose: components reconstruct the series exactly") {
    val rows = run("events_stl_decompose")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cents = r.getAs[Long]("cents")
      val trend = r.getAs[Long]("trend_cents")
      val sx2 = r.getAs[Long]("seasonal_x2")
      val rx2 = r.getAs[Long]("remainder_x2")
      assert(2 * cents == 2 * trend + sx2 + rx2,
        s"decomposition identity broken at day ${r.getAs[Long]("day")}")
    }
  }

  test("events_bandit_replay: regret non-negative, cumulative monotone, " +
      "explore gate near 1/4") {
    val rows = run("events_bandit_replay").sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    var prevCum = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("regret_e6") >= 0L)
      val cum = r.getAs[Long]("cum_regret_e6")
      assert(cum >= prevCum, "cumulative regret decreased")
      prevCum = cum
    }
    val exploreFrac =
      rows.count(_.getAs[Boolean]("explored")).toDouble / rows.length
    assert(exploreFrac > 0.10 && exploreFrac < 0.45,
      s"hash explore gate off: $exploreFrac")
  }

  test("orders_logrank: statistic well-formed") {
    val Array(r) = run("orders_logrank")
    assert(r.getAs[Long]("o1") >= 0L)
    assert(r.getAs[Long]("v_e9") > 0L, "zero variance")
    assert(r.getAs[Long]("n_times") > 0L)
    assert(r.getAs[Long]("chi2_e6") >= 0L)
  }

  test("sim_binary_topk: ranks dense, hamming monotone within query") {
    val rows = run("sim_binary_topk")
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 8)
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5),
        s"query $q ranks not dense")
      val hs = sorted.map(_.getAs[Int]("hamming"))
      assert(hs.forall(h => h >= 0 && h <= 64))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
        s"query $q hamming not monotone in rank")
    }
  }

  test("pack_bestfit: caps respected, every doc packed exactly once") {
    val rows = run("pack_bestfit")
    val docs = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet").count()
    assert(rows.length == docs, s"${rows.length} packed of $docs docs")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length ==
      rows.length, "a doc packed twice")
    val binLoads = rows.groupBy(r =>
      (r.getAs[Long]("shard"), r.getAs[Int]("bin")))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_tokens")).sum }
    assert(binLoads.forall(_ <= 2048L),
      s"bin over cap: ${binLoads.max}")
    // BFD on this fixture beats naive one-doc-one-bin by a wide margin
    assert(binLoads.size < docs / 2, s"${binLoads.size} bins for $docs docs")
  }

  test("text_char_entropy: bounds hold per document") {
    val rows = run("text_char_entropy")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("entropy_bits_e6")
      val nd = r.getAs[Long]("n_distinct")
      val n = r.getAs[Long]("n_chars")
      assert(nd <= n)
      assert(h >= 0L, s"negative entropy $h")
      // H <= log2(n_distinct) (+1 ulp slack in e6)
      val hmax = math.log(nd.toDouble) / math.log(2.0) * 1e6 + 1
      assert(h <= hmax, s"entropy $h above log2($nd) bound")
    }
  }

  test("profile_psi: contributions non-negative, bins partition, " +
      "ref mass equidepth") {
    val rows = run("profile_psi").sortBy(_.getAs[Int]("bin"))
    assert(rows.length == 5, s"expected 5 bins, got ${rows.length}")
    // (p_cur − p_ref)·ln(p_cur/p_ref) has matching signs — every
    // bin's PSI contribution is mathematically ≥ 0 (= 0 only when
    // the masses tie); a negative value means the formula broke
    rows.foreach(r => assert(r.getAs[Long]("psi_e9") >= 0L,
      s"negative PSI contribution in bin ${r.getAs[Int]("bin")}"))
    val total = rows.head.getAs[Long]("psi_total_e9")
    assert(rows.forall(_.getAs[Long]("psi_total_e9") == total))
    assert(total == rows.map(_.getAs[Long]("psi_e9")).sum)
    // equidepth on the reference: every bin holds 20% ± rounding
    rows.foreach { r =>
      val ppm = r.getAs[Long]("ref_ppm")
      assert(ppm > 150000 && ppm < 250000,
        s"ref bin ${r.getAs[Int]("bin")} not equidepth: $ppm ppm")
    }
    val alerts = rows.map(_.getAs[String]("alert")).distinct
    assert(alerts.length == 1 &&
      Set("stable", "investigate", "act")(alerts.head))
  }

  test("analytics_trimmed_mean: cuts ordered, mean inside the cuts, " +
      "kept count exact") {
    val rows = run("analytics_trimmed_mean")
    assert(rows.length == 3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val kept = r.getAs[Long]("kept")
      assert(kept == n - 2 * (n / 5), "kept != n - 2*(n div 5)")
      val lo = r.getAs[Long]("lo_cut")
      val hi = r.getAs[Long]("hi_cut")
      assert(lo <= hi)
      val meanE2 = r.getAs[Long]("trimmed_mean_e2")
      assert(meanE2 >= lo * 100 && meanE2 <= hi * 100,
        s"trimmed mean $meanE2 outside cut window [$lo, $hi] cents")
    }
  }

  test("ml_quantile_regression: line above the mean ratio, coverage " +
      "between count and target") {
    val rows = run("ml_quantile_regression")
    assert(rows.length == 3)
    rows.foreach { r =>
      // τ = 0.9 > 0.5 ⇒ the pinball line sits above the mean-ratio
      // start, and x-weighted coverage must EXCEED count coverage
      // here (big-x rows fall under the line preferentially) while
      // moving toward the 0.9 target from 0.5
      val xcov = r.getAs[Long]("xcover_ppm")
      val ccov = r.getAs[Long]("cover_ppm")
      assert(xcov > ccov, s"xcover $xcov <= count cover $ccov")
      assert(xcov > 600000L && xcov <= 1000000L,
        s"xcover $xcov not converging toward the 0.9 target")
    }
  }

  test("sample_priority_topk: exactly k rows, estimator floors at tau") {
    val rows = run("sample_priority_topk")
    assert(rows.length == 100, s"expected k=100 rows, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 100)
    val minPriority = rows.map(_.getAs[Long]("priority")).min
    rows.foreach { r =>
      // every kept priority beats the threshold, and ŵ = max(w, τ)
      // can never sit below the raw weight
      assert(r.getAs[Long]("w_hat") >= r.getAs[Long]("w"))
      assert(r.getAs[Long]("priority") >= minPriority)
    }
  }

  test("events_mann_whitney: U within range, direction matches, z2 sane") {
    val rows = run("events_mann_whitney")
    assert(rows.length == 1)
    val r = rows.head
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    val u2 = r.getAs[Long]("u2_a")
    assert(u2 >= 0L && u2 <= 2 * na * nb, s"2U=$u2 outside [0, 2·nA·nB]")
    val dir = r.getAs[Int]("direction")
    assert(dir == Integer.signum(
      java.lang.Long.compare(u2, na * nb)))
    assert(r.getAs[Long]("z2_e6") >= 0L)
  }

  test("profile_psi: extreme drift (empty current bins) yields a " +
      "finite 'act' verdict, not a crash") {
    // ADVICE r9: pre-clamp, a bin with zero current mass made
    // ln(cur/ref) = -Inf and the e9 cast failed — the drift gate
    // crashed precisely in the scenario it exists to flag. Synthetic
    // orders: reference period uniform over 5 bins, current period
    // concentrated entirely in the top bin.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("psi_drift").toString
    val ref = (1 to 100).map(i =>
      (f"1997-0${i % 6 + 1}-15", i.toDouble))
    val cur = (1 to 50).map(_ => ("1998-06-15", 95.0))
    (ref ++ cur).toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("profile_psi")(spark, dir)
      .collect().sortBy(_.getAs[Int]("bin"))
    assert(rows.length == 5)
    // bins 0-3 are empty in the current period — raw ppm stays 0
    rows.take(4).foreach(r => assert(r.getAs[Long]("cur_ppm") == 0L,
      s"bin ${r.getAs[Int]("bin")} expected empty"))
    // every contribution finite and non-negative; verdict is 'act'
    rows.foreach(r => assert(r.getAs[Long]("psi_e9") >= 0L))
    assert(rows.head.getAs[Long]("psi_total_e9") >= 250000000L)
    assert(rows.forall(_.getAs[String]("alert") == "act"))
  }

  test("sample_priority_topk: corpus smaller than k keeps every doc " +
      "with w_hat = w (no threshold)") {
    // ADVICE r9 (oracle side): with <= k eligible docs there is no
    // rank-(k+1) priority, so DLT defines NO threshold — every doc is
    // its own estimate. The engine's null-skipping greatest already
    // did this; the oracle now LEFT-joins tau to agree. This pins the
    // engine half of that contract.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("ptopk_small").toString
    Seq((1L, "alpha beta gamma"), (2L, "delta"), (3L, "ep ze eta th"),
        (4L, "iota kappa"), (5L, "lambda mu nu"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("sample_priority_topk")(spark, dir)
      .collect()
    assert(rows.length == 5, s"expected all 5 docs, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("w_hat") == r.getAs[Long]("w"),
        s"doc ${r.getAs[Long]("doc_id")}: w_hat != w with no threshold")
    }
  }

  test("orders_cox_ph: hazard ratios consistent with betas, " +
      "partial likelihood negative, counts coherent") {
    val Array(r) = run("orders_cox_ph")
    val b1 = r.getAs[Long]("b1_e6"); val b2 = r.getAs[Long]("b2_e6")
    val hr1 = r.getAs[Long]("hr1_e6"); val hr2 = r.getAs[Long]("hr2_e6")
    // hr = exp(b): recompute within 1 e6-ulp of the emitted value
    assert(math.abs(math.round(math.exp(b1 / 1e6) * 1e6) - hr1) <= 1)
    assert(math.abs(math.round(math.exp(b2 / 1e6) * 1e6) - hr2) <= 1)
    assert(r.getAs[Long]("n") >= r.getAs[Long]("n_events"))
    assert(r.getAs[Long]("n_events") > 0)
    // log of a product of probabilities < 1
    assert(r.getAs[Long]("pll_e6") < 0L)
    // the synthetic fixture has no planted covariate effect: 4 mean-
    // gradient rounds must stay in a sane hazard-ratio band
    assert(hr1 > 500000L && hr1 < 2000000L)
    assert(hr2 > 500000L && hr2 < 2000000L)
  }

  test("embed_isolation_forest: dense ranks, monotone paths and " +
      "scores, depth bounds hold") {
    val rows = run("embed_isolation_forest").sortBy(_.getAs[Int]("rank"))
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 50))
    val paths = rows.map(_.getAs[Long]("avg_path_e6"))
    assert(paths.zip(paths.tail).forall { case (a, b) => a <= b },
      "avg path not monotone in rank")
    val scores = rows.map(_.getAs[Long]("score_e6"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "score not monotone in rank")
    // a path is at least 1 split and at most depth + c(leaf) levels;
    // c(m) <= c(n) and depth = 8, so 16e6 is a generous roof
    assert(paths.forall(p => p >= 1000000L && p < 16000000L))
    assert(scores.forall(s => s > 0L && s < 1000000L))
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 50)
  }

  test("events_kruskal_wallis: H consistent with the pairwise MW " +
      "shape, counts coherent, tie fraction bounded") {
    val Array(r) = run("events_kruskal_wallis")
    val n = r.getAs[Long]("n_purchase") + r.getAs[Long]("n_view") +
      r.getAs[Long]("n_click")
    assert(r.getAs[Long]("n_purchase") > 0 &&
      r.getAs[Long]("n_view") > 0 && r.getAs[Long]("n_click") > 0)
    val h = r.getAs[Long]("h_e6")
    // 0 <= H <= N-1 (rank variance bound), e6-scaled
    assert(h >= 0L && h <= (n - 1) * 1000000L, s"H out of range: $h")
    assert(r.getAs[Long]("tie_ppm") >= 0L &&
      r.getAs[Long]("tie_ppm") <= 1000000L)
    assert(r.getAs[Long]("reject_05") ==
      (if (h >= 5991465L) 1L else 0L))
  }

  test("recs_als_rank1: 3 recs per eval customer, never an already-" +
      "bought part, scores positive and ranked") {
    val rows = run("recs_als_rank1")
    assert(rows.nonEmpty)
    val byC = rows.groupBy(_.getAs[Long]("o_custkey"))
    byC.foreach { case (c, rs) =>
      assert(c <= 20L)
      val ranked = rs.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to rs.length))
      assert(rs.length <= 3)
      val sc = ranked.map(_.getAs[Long]("score_e6"))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
      assert(sc.forall(_ > 0L), s"non-positive ALS score for cust $c")
    }
    // no recommendation may be a part the customer already bought
    val bought = spark.read
      .parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(spark.read.parquet(sf("sf0.001") + "/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val key = (r.getAs[Long]("o_custkey"), r.getAs[Long]("l_partkey"))
      assert(!bought(key), s"recommended an already-bought part: $key")
    }
  }

  test("cluster_farthest_first: k distinct centers cover the corpus") {
    val rows = run("cluster_farthest_first")
    assert(rows.length == 4, s"expected 4 centers, got ${rows.length}")
    val ids = rows.map(_.getAs[Long]("center_id"))
    assert(ids.distinct.length == 4)
    val total = rows.map(_.getAs[Long]("n_assigned")).sum
    val corpus = spark.read
      .parquet(sf("sf0.001") + "/embeddings.parquet").count()
    assert(total == corpus,
      s"assignment covers $total of $corpus vectors")
    rows.foreach(r => assert(r.getAs[Long]("radius_sq") >= 0L))
  }

  test("events_anova_f: F nonnegative, counts match kruskal-wallis, " +
      "same samples") {
    val Array(r) = run("events_anova_f")
    val Array(kw) = run("events_kruskal_wallis")
    for (c <- Seq("n_purchase", "n_view", "n_click"))
      assert(r.getAs[Long](c) == kw.getAs[Long](c),
        s"$c differs from the KW rollup — not the same samples")
    assert(r.getAs[Long]("f_e6") >= 0L)
    assert(Set(0L, 1L)(r.getAs[Long]("reject_05")))
  }

  test("events_ljung_box: Q rebuilt exactly from events_autocorr's " +
      "published ACF") {
    val Array(r) = run("events_ljung_box")
    val nn = r.getAs[Long]("n_days")
    val acf = run("events_autocorr")
    assert(acf.length == 7)
    val tsum = acf.map { a =>
      val rhoPpm = math.round(a.getAs[Double]("r") * 1e6)
      val lag = a.getAs[Int]("lag").toLong
      rhoPpm * rhoPpm / (nn - lag)
    }.sum
    assert(r.getAs[Long]("q_e6") == nn * (nn + 2) * tsum / 1000000L,
      "Q does not reconstruct from the ACF query's own output")
    assert(r.getAs[Long]("reject_05") ==
      (if (r.getAs[Long]("q_e6") >= 14067141L) 1L else 0L))
  }

  test("pref_bradley_terry: wins bounded by comparisons, duel totals " +
      "balance, strengths nonnegative and responsive") {
    val rows = run("pref_bradley_terry")
    assert(rows.nonEmpty)
    var totWins = 0L
    var totComp = 0L
    rows.foreach { r =>
      val w = r.getAs[Long]("wins")
      val m = r.getAs[Long]("n_comparisons")
      assert(w >= 0L && w <= m)
      assert(r.getAs[Long]("strength_e6") >= 0L)
      totWins += w; totComp += m
    }
    // every duel contributes 1 win and appears in BOTH items' m
    assert(totComp == 2 * totWins,
      s"duel bookkeeping broken: wins $totWins comparisons $totComp")
    // strengths order with win RATE on this near-balanced fixture
    val byRate = rows.sortBy(r =>
      -r.getAs[Long]("wins").toDouble / r.getAs[Long]("n_comparisons"))
    val byStr = rows.sortBy(-_.getAs[Long]("strength_e6"))
    assert(byRate.map(_.getAs[String]("event_type")).head ==
      byStr.map(_.getAs[String]("event_type")).head,
      "top item by win rate != top item by fitted strength")
  }

  test("orders_regression_discontinuity: rate intercepts in [0,1], " +
      "tau the exact jump, sides populated") {
    val rows = run("orders_regression_discontinuity")
    assert(rows.length == 3, s"expected 3 statuses, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("ok") == 1L, "degenerate side at sf0.001")
      assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
      val al = r.getAs[Long]("alpha_left_e6")
      val ar = r.getAs[Long]("alpha_right_e6")
      // local-linear intercepts of a {0,1} outcome can overshoot [0,1]
      // slightly at small n; ±0.5 is a generous sanity band
      assert(al > -500000L && al < 1500000L, s"alpha_left $al")
      assert(ar > -500000L && ar < 1500000L, s"alpha_right $ar")
      assert(r.getAs[Long]("tau_e6") == ar - al)
    }
  }

  test("events_sprt: llr identity, verdict thresholds, stopping " +
      "monotone") {
    val rows = run("events_sprt").sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    var prevN = 0L
    var prevStopped = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_cum")
      val c = r.getAs[Long]("conv_cum")
      val llr = r.getAs[Long]("llr_e6")
      assert(n >= prevN && c <= n); prevN = n
      assert(llr == c * 182322L + (n - c) * -68993L, "llr identity")
      val v = r.getAs[Long]("verdict")
      assert(v == (if (llr >= 2944439L) 1L
        else if (llr <= -2944439L) -1L else 0L))
      val st = r.getAs[Long]("stopped")
      assert(st >= prevStopped, "stopped flag regressed")
      prevStopped = st
    }
  }

  test("cluster_single_linkage: clusters partition the corpus in " +
      "coordinate order; split gaps dominate internal gaps") {
    val rows = run("cluster_single_linkage")
      .sortBy(_.getAs[Long]("cluster_idx"))
    assert(rows.length >= 2 && rows.length <= 8)
    val corpus = spark.read
      .parquet(sf("sf0.001") + "/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_points")).sum == corpus)
    // extents ordered and disjoint, separated by exactly split_gap
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_x") < b.getAs[Long]("min_x"))
      assert(b.getAs[Long]("min_x") - a.getAs[Long]("max_x") ==
        a.getAs[Long]("split_gap"), "split_gap is not the boundary gap")
    }
    // single-linkage guarantee: every cut gap >= every surviving
    // (internal) gap — the k-cluster solution cuts the LARGEST gaps
    val minSplit = rows.init.map(_.getAs[Long]("split_gap")).min
    rows.foreach { r =>
      val span = r.getAs[Long]("max_x") - r.getAs[Long]("min_x")
      val nd = r.getAs[Long]("n_distinct")
      if (nd > 1) {
        // avg internal gap <= span/(nd-1) <= minSplit is implied by
        // max internal gap <= minSplit; assert the weaker avg form
        // computable from the summary row
        assert(span / (nd - 1) <= minSplit,
          s"cluster ${r.getAs[Long]("cluster_idx")} internal gaps " +
            s"exceed the smallest cut ($minSplit)")
      }
    }
  }
}
