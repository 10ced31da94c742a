package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-10 causal/quality/validity set (q351–q356)
  * that value-equality against DuckDB can't see: Shapley efficiency and
  * the unanimity-identity collapse, RD's windowed effect algebra, the
  * Wald estimator's exact rational, the Gopher rule battery's count
  * conservation, silhouette range bounds, and gains-curve monotonicity.
  */
class CausalValiditySpec extends AnyFunSuite {
  import TestSession._

  test("q351 Shapley: efficiency (credits sum to 24x total cents), " +
    "coalition sum equals the unanimity identity, shares sum to ~1e6") {
    val rows = SparkEntry.queries("q351_shapley_attribution")(spark, sfDir)
      .collect()
    assert(rows.length == 4, "one row per channel")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(4),
        s"coalition-sum Shapley != unanimity identity on channel " +
          s"${r.getLong(0)}: ${r.getLong(3)} vs ${r.getLong(4)}")
    }
    // efficiency: sum of phi_c*24 over channels == 24 * total attributed
    // cents (the grand-coalition value). Total attributed cents = the
    // touched-journey cents counted ONCE per journey — recompute from
    // the touch universe.
    val (_, j) = operators.Experimentation.touchUniverse(spark, sfDir)
    val totalCents = j.groupBy(col("pid")).agg(max(col("cents")).as("c"))
      .agg(sum(col("c"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == 24L * totalCents,
      s"Shapley efficiency violated: ${rows.map(_.getLong(3)).sum} vs " +
        s"${24L * totalCents}")
    val shareSum = rows.map(_.getLong(5)).sum
    assert(shareSum >= 999996L && shareSum <= 1000000L,
      s"shares must sum to 1e6 ppm minus div-floor dust: $shareSum")
  }

  test("q352 RD: both sides fitted, effect column is exactly the " +
    "intercept gap, and slopes/intercepts are in plausible ranges") {
    val rows = SparkEntry.queries("q352_regression_discontinuity")(
      spark, sfDir).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val (l, r) = (rows(0), rows(1))
    assert(l.getLong(4) == r.getLong(4), "effect must repeat per row")
    assert(r.getLong(2) - l.getLong(2) == r.getLong(4),
      "rd_effect_micro must equal intercept_right - intercept_left")
    // intercepts are micro-lineitems-per-order: positive, under 100
    Seq(l, r).foreach { row =>
      assert(row.getLong(2) > 0 && row.getLong(2) < 100000000L)
      assert(row.getLong(1) > 0, "both sides must have orders in band")
    }
  }

  test("q353 Wald IV: estimator equals the exact cross-multiplied " +
    "rational of its own emitted numerators") {
    val r = SparkEntry.queries("q353_wald_iv_estimator")(spark, sfDir)
      .head()
    val (yNum, tNum) = (r.getLong(4), r.getLong(5))
    if (tNum != 0) {
      val expect = BigInt(yNum) * 1000000 / BigInt(tNum)
      assert(BigInt(r.getLong(6)) == expect,
        s"wald_cents_micro ${r.getLong(6)} != $expect")
    } else assert(r.isNullAt(6), "zero first stage must yield NULL")
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
  }

  test("q354 Gopher rules: pass_all + per-rule fails are consistent " +
    "with the doc count (union bound both directions)") {
    val rows = SparkEntry.queries("q354_gopher_quality_rules")(
      spark, sfDir).collect()
    val m = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.t(spark, sfDir, "documents").count()
    val fails = m.filter(_._1.startsWith("fail_")).values
    val passAll = m("pass_all")
    // union bound: docs failing >=1 rule <= sum of per-rule fails
    assert(total - passAll <= fails.sum,
      s"pass_all $passAll inconsistent with fails $fails of $total")
    // every single rule's fail count also lower-bounds the rejects
    fails.foreach(f => assert(total - passAll >= f))
    assert(m.values.forall(_ >= 0) && passAll <= total)
  }

  test("q355 cluster validity: silhouette in [-1,1], positive scatter " +
    "and DB components, nearest label is a different cluster") {
    val rows = SparkEntry.queries("q355_cluster_validity")(spark, sfDir)
      .collect()
    assert(rows.length == 10, "10 label clusters")
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0,
        s"silhouette out of range: ${r.getDouble(2)}")
      assert(r.getDouble(3) > 0.0 && r.getDouble(4) > 0.0)
      assert(r.getLong(5) != r.getLong(0),
        "nearest_label must be a different cluster")
      assert(r.getLong(1) > 0)
    }
    // uniform random embeddings: clusters are NOT separable, so the
    // simplified silhouette must sit near zero (the metric's honest
    // reading of unclusterable data) — a large value would mean the
    // distance algebra is broken
    val meanSil = rows.map(_.getDouble(2)).sum / rows.length
    assert(math.abs(meanSil) < 0.2,
      s"uniform fixture should have near-zero silhouette: $meanSil")
  }

  test("q356 gains: deciles ascend, cumulatives are monotone, the " +
    "final row captures all users and all positives") {
    val rows = SparkEntry.queries("q356_cumulative_gains")(spark, sfDir)
      .collect()
    val deciles = rows.map(_.getLong(0)).toSeq
    assert(deciles == deciles.sorted && deciles.distinct == deciles)
    assert(deciles.forall(d => d >= 1 && d <= 10))
    val cumU = rows.map(_.getLong(3)).toSeq
    val cumP = rows.map(_.getLong(4)).toSeq
    assert(cumU == cumU.sorted && cumP == cumP.sorted)
    val users = Tables.t(spark, sfDir, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(cumU.last == users, s"last cum_users ${cumU.last} != $users")
    assert(rows.last.getLong(5) == 1000000L,
      "final cum_gain_ppm must be exactly 1e6")
    // lift decreases (weakly) as deciles accumulate toward the base rate
    val lifts = rows.map(_.getLong(6)).toSeq
    assert(lifts.last <= lifts.head,
      s"head lift ${lifts.head} must be >= tail lift ${lifts.last}")
  }

  test("q357 top supplier: every surfaced row carries the one global " +
    "max revenue") {
    val rows = SparkEntry.queries("q357_top_supplier")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).distinct.length == 1,
      "all surfaced suppliers must share the max revenue")
  }

  test("q358 Kruskal-Wallis: accepts on the region-independent fixture, " +
    "tie correction only inflates H, N equals the orders count") {
    val r = SparkEntry.queries("q358_kruskal_wallis")(spark, sfDir).head()
    assert(r.getLong(0) == 5, "five region groups")
    assert(r.getLong(1) == Tables.t(spark, sfDir, "orders").count())
    assert(r.getLong(3) <= 1000000L, "tie_corr_ppm is a shrink factor")
    assert(r.getLong(4) >= r.getLong(2),
      "tie-corrected H must be >= raw H")
    assert(!r.getBoolean(5),
      "uniform region-independent prices must NOT reject at 95%")
  }

  test("q359 resample: n_out = 2*n_in - 1, 16 kHz attested by the " +
    "codec, interpolation cannot exceed the input amplitude range") {
    val rows = SparkEntry.queries("q359_audio_resample")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == 2 * r.getInt(1) - 1,
        s"doc ${r.getLong(0)}: n_out ${r.getInt(2)} != 2*n_in-1")
      assert(r.getInt(3) == 16000)
      assert(r.getInt(6) <= 2000,
        "a linear midpoint can never exceed the +/-2000 input range")
    }
  }

  test("q360 equalize: brightest occupied bin maps to 255, mapped " +
    "values stay in [0,255], channel mass bounded by 255*n") {
    val rows = SparkEntry.queries("q360_image_equalize")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getInt(1).toLong * r.getInt(2)
      assert(r.getInt(7) == 255,
        s"doc ${r.getLong(0)}: max_eq must be 255")
      assert(r.getInt(6) >= 0 && r.getLong(4) <= 255L * n)
      assert(r.getInt(5) >= 1 && r.getInt(5) <= 256)
    }
  }

  test("q361 bloom: NO false negatives (passes >= exact matches), " +
    "false positives exactly reconcile, fp rate sane for m/n") {
    val r = SparkEntry.queries("q361_bloom_semi_reduction")(spark, sfDir)
      .head()
    val (nFacts, nExact, nPass, fp) =
      (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nPass >= nExact, "bloom must never drop a true match")
    assert(fp == nPass - nExact)
    assert(fp <= nFacts - nExact)
    // k=2, m=4093, n<=~600 set bits -> fp well under 5%
    assert(r.getLong(6) < 50000L,
      s"fp_ppm ${r.getLong(6)} implausibly high for this m/n")
  }

  test("q362 Merkle reconcile: the planted drift is found, rescan " +
    "touches a strict subset of rows, buckets reconcile") {
    val r = SparkEntry.queries("q362_merkle_reconcile")(spark, sfDir)
      .head()
    assert(r.getLong(0) == 64)
    assert(r.getLong(1) >= 1 && r.getLong(1) <= 64)
    assert(r.getLong(4) >= 1, "the planted drift must be detected")
    assert(r.getLong(3) < r.getLong(2),
      "digest comparison must beat a full-table rescan")
    assert(r.getLong(3) >= r.getLong(4),
      "rescanned rows bound the divergent rows found in them")
  }

  test("q363 Markov attribution: removal can only reduce conversion, " +
    "shares normalize, effects and base are consistent") {
    val rows = SparkEntry.queries("q363_markov_attribution")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val base = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) == base), "one base per corpus")
    assert(base > 0 && base <= 1000000L)
    rows.foreach { r =>
      assert(r.getLong(2) <= base,
        s"removing channel ${r.getLong(0)} must not raise conversion")
      assert(r.getLong(2) >= 0)
    }
    val shareSum = rows.map(_.getLong(4)).sum
    assert(shareSum >= 999996L && shareSum <= 1000000L,
      s"shares must sum to 1e6 minus floor dust: $shareSum")
  }

  test("q364 nprobe sweep: recall monotone nondecreasing, candidate " +
    "staircase strictly increasing, full sweep beats the first probe") {
    val rows = SparkEntry.queries("q364_ivf_nprobe_sweep")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val recalls = rows.map(_.getLong(3)).toSeq
    val cands = rows.map(_.getLong(1)).toSeq
    assert(recalls == recalls.sorted,
      s"recall must be monotone in nprobe: $recalls")
    assert(cands == cands.sorted && cands.distinct == cands,
      s"candidate counts must strictly increase: $cands")
    assert(recalls.forall(r => r >= 0 && r <= 1000000L))
    assert(recalls.last >= 500000L,
      s"probing half the lists must recover >= 50%: ${recalls.last}")
  }

  test("q365 BPE train: 8 ordered iterations, positive merge counts, " +
    "all learned pairs distinct") {
    val rows = SparkEntry.queries("q365_bpe_train_merges")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(rows.forall(_.getLong(3) > 0))
    val pairs = rows.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == pairs.length,
      "BPE can never learn the same pair twice (it was merged away)")
    rows.foreach(r =>
      assert(r.getString(1).nonEmpty && r.getString(2).nonEmpty))
  }

  test("q366 trending: ranks are 1..10, the dyadic score is bracketed " +
    "by [2*raw, 1024*raw], rank_shift reconciles") {
    val rows = SparkEntry.queries("q366_trending_decay")(spark, sfDir)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length))
    rows.foreach { r =>
      val (raw, score) = (r.getLong(2), r.getLong(3))
      assert(score >= 2 * raw && score <= 1024 * raw,
        s"${r.getString(1)}: score $score outside [2*$raw, 1024*$raw]")
      assert(r.getLong(5) == r.getLong(4) - r.getLong(0))
    }
  }

  test("q367 Q7 volume shipping: both directions present, revenue " +
    "positive, years within the fixture span") {
    val rows = SparkEntry.queries("q367_volume_shipping")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(r => (r.getLong(0), r.getLong(1))).distinct
    assert(dirs.forall(d => d == (0L, 1L) || d == (1L, 0L)))
    rows.foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
      assert(r.getLong(2) >= 1995L && r.getLong(2) <= 2001L)
    }
  }

  test("q368 column profile: six columns, no nulls in the fixture, " +
    "distinct bounded by rows, orderkey is a unique key") {
    val rows = SparkEntry.queries("q368_column_profile")(spark, sfDir)
      .collect()
    assert(rows.length == 6)
    val n = rows.head.getLong(1)
    rows.foreach { r =>
      assert(r.getLong(1) == n, "one row count for the table")
      assert(r.getLong(2) == 0, s"${r.getString(0)}: fixture has no nulls")
      assert(r.getLong(3) >= 1 && r.getLong(3) <= n)
      assert(r.getString(4) <= r.getString(5) ||
        r.getString(0) == "o_orderkey" ||
        r.getString(0) == "o_custkey" ||
        r.getString(0) == "o_totalprice_cents",
        s"${r.getString(0)}: min_repr must not exceed max_repr " +
          "(numeric reprs compare numerically, not lexically)")
    }
    val ok = rows.find(_.getString(0) == "o_orderkey").get
    assert(ok.getLong(3) == n, "o_orderkey must be unique")
  }

  test("q369 power iteration: Rayleigh quotient monotone " +
    "nondecreasing, EVR in [1/64, 1], 8 iterations") {
    val rows = SparkEntry.queries("q369_power_iteration_pc1")(
      spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    val ray = rows.map(_.getLong(1)).toSeq
    assert(ray == ray.sorted,
      s"power iteration must not lose Rayleigh mass: $ray")
    rows.foreach { r =>
      assert(r.getLong(2) >= 1000000L / 64 && r.getLong(2) <= 1000000L,
        s"EVR ${r.getLong(2)} outside [1/64, 1]")
    }
  }

  test("q370 randomized response: reported flips reconcile exactly, " +
    "debiased estimate lands within the mechanism's noise envelope") {
    val r = SparkEntry.queries("q370_randomized_response")(spark, sfDir)
      .head()
    val (n, truePos, flipped, reported) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // with truth t and f flips among the positives/negatives, reported
    // = truePos - flippedPos + flippedNeg — bounded by truePos +/- flips
    assert(reported >= truePos - flipped && reported <= truePos + flipped)
    assert(r.getLong(6) == math.abs(r.getLong(4) - r.getLong(5)))
    // 2x debias amplification: |err| <= 2 * flips/n (worst case all
    // flips land one way)
    assert(r.getLong(6) <= 2L * flipped * 1000000L / n + 2)
  }

  test("q371 LSH candidate eval: cells reconcile with q63's confirmed " +
    "pairs, recall high at the fixture's banding, candidates sparse") {
    val r = SparkEntry.queries("q371_lsh_candidate_eval")(spark, sfDir)
      .head()
    val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val confirmed = SparkEntry.queries("q63_minhash_lsh_pairs")(
      spark, sfDir).count()
    // q63 = exact-confirm(candidates): its output is exactly the TP set
    assert(tp == confirmed,
      s"tp $tp must equal q63's confirmed pair count $confirmed")
    assert(fn * 1000000 <= (tp + fn) * 100000 || fn == 0,
      s"miss rate implausibly high for 16x4 bands at jac>=0.8: $fn")
    assert(r.getLong(5) < 100000L,
      "candidate stage must stay far under the quadratic")
    assert(fp >= 0)
  }

  test("q372 HLL audit: every probe's error inside 5x its rsd, exact " +
    "column equals a direct countDistinct") {
    val rows = SparkEntry.queries("q372_hll_error_audit")(spark, sfDir)
      .collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(4) <= 5 * r.getLong(1),
        s"${r.getString(0)} rsd=${r.getLong(1)}: error ${r.getLong(4)} " +
          "outside the 5-sigma envelope")
    }
    val exactCust = Tables.t(spark, sfDir, "orders")
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    rows.filter(_.getString(0) == "orders.o_custkey")
      .foreach(r => assert(r.getLong(2) == exactCust))
  }

  test("q375 Q12: line counts partition the late set exactly") {
    val rows = SparkEntry.queries("q375_shipmode_priority")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val late = Tables.t(spark, sfDir, "lineitem")
      .join(Tables.t(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 60 DAYS")).count()
    assert(total == late, s"priority branches must partition: $total vs $late")
  }

  test("q376 Q14: promo share bracketed by [0, 1e6], cents reconcile") {
    val r = SparkEntry.queries("q376_promo_revenue_share")(spark, sfDir)
      .head()
    assert(r.getLong(0) >= 0 && r.getLong(0) <= r.getLong(1))
    assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L)
    assert(r.getLong(2) > 0)
  }

  test("q377 interpolated percentiles: monotone in pct, interpolant " +
    "bracketed by [lo, hi], rem consistent with the type-7 position") {
    val rows = SparkEntry.queries("q377_percentile_interpolated")(
      spark, sfDir).collect().sortBy(_.getLong(0))
    val vals = rows.map(_.getLong(5)).toSeq
    assert(vals == vals.sorted, "percentiles must be monotone in pct")
    rows.foreach { r =>
      val (n, lo, hi, rem, v) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo <= hi)
      assert(v >= lo * 100 && v <= hi * 100,
        "interpolant must sit inside [lo, hi] scaled")
      assert(rem == r.getLong(0) * (n - 1) % 100)
    }
  }

  test("q379 confusion matrix: cells partition the corpus, class " +
    "shares sum to ~1e6 per labeled language") {
    val rows = SparkEntry.queries("q379_langid_confusion")(spark, sfDir)
      .collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.t(spark, sfDir, "documents").count(),
      "every document lands in exactly one cell")
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val share = cells.map(_.getLong(3)).sum
      assert(share >= 999990L && share <= 1000000L,
        s"$lang shares must sum to 1e6 minus floor dust: $share")
    }
  }

  test("q380 Neyman: allocations sum EXACTLY to the 1000 budget, " +
    "weights positive, proportional column sums to ~1000") {
    val rows = SparkEntry.queries("q380_neyman_allocation")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(4)).sum == 1000L,
      "largest-remainder must conserve the budget exactly")
    assert(rows.forall(_.getLong(2) > 0))
    val prop = rows.map(_.getLong(3)).sum
    assert(prop >= 995 && prop <= 1000)
  }

  test("q381 assortativity: moments are internally consistent and the " +
    "hash-uniform fixture mixes near-neutrally") {
    val r = SparkEntry.queries("q381_degree_assortativity")(spark, sfDir)
      .head()
    assert(r.getLong(0) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
    assert(r.getLong(4) == (if (r.getLong(1) >= 0) 1L else -1L))
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L)
    assert(r.getLong(5) < 100000L,
      s"uniform pairing must be near-neutral: r2_ppm=${r.getLong(5)}")
  }

  test("q382 Q19: branches are mutually exclusive (counts partition " +
    "the tagged set) and revenue is positive per branch") {
    val rows = SparkEntry.queries("q382_disjunctive_predicates")(
      spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 3)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("q383 growth accounting: both waterfall identities hold on " +
    "every week — actives = new + retained + resurrected, and " +
    "delta-actives = new + resurrected - churned") {
    val rows = SparkEntry.queries("q383_growth_accounting")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    var prevActives = 0L
    rows.foreach { r =>
      val (act, nw, ret, res, ch) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(act == nw + ret + res,
        s"week ${r.getLong(0)}: actives $act != $nw + $ret + $res")
      assert(act - prevActives == nw + res - ch,
        s"week ${r.getLong(0)}: delta identity broken")
      assert(ch >= 0 && ret <= prevActives || prevActives == 0)
      prevActives = act
    }
    assert(rows.head.getLong(1) == rows.head.getLong(2),
      "the first week is all-new by definition")
  }

  test("q378 elbow: inertia non-increasing in k, four sweep points") {
    val rows = SparkEntry.queries("q378_kmeans_elbow")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L, 16L))
    val inertia = rows.map(_.getLong(2)).toSeq
    assert(inertia == inertia.sorted.reverse,
      s"more clusters can never fit worse: $inertia")
    assert(inertia.forall(_ > 0))
  }

  test("q392 winnowing: the gap <= w theorem holds (zero violations), " +
    "density sits in the 2/(w+1) band, worst gap is bounded by w") {
    val rows = SparkEntry.queries("q392_winnowing_fingerprints")(
      spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("guarantee_violations") == 0L,
        s"winnowing's gap guarantee is a THEOREM — lang ${r.getString(0)}")
      assert(r.getAs[Long]("worst_gap") <= 4L,
        s"max inter-selection gap must be <= w=4 on lang ${r.getString(0)}")
      val d = r.getAs[Long]("density_ppm")
      // theory: expected density 2/(w+1) = 400000 ppm on random hashes;
      // real text repeats grams, so allow a generous band
      assert(d > 200000L && d < 600000L, s"density_ppm out of band: $d")
    }
  }

  test("q393 suffix-array dedup: pair count conservation (suffixes - 1 " +
    "across the corpus), LCPs within [0, 64], flagged docs <= docs") {
    val out = SparkEntry.queries("q393_suffix_array_dedup")(spark, sfDir)
      .collect()
    val nSuffix = Tables.t(spark, sfDir, "documents")
      .agg(sum(length(col("text")))).head().getLong(0)
    assert(out.map(_.getAs[Long]("n_pairs")).sum == nSuffix - 1,
      "every rank-adjacent pair must be graded exactly once")
    out.foreach { r =>
      assert(r.getAs[Long]("max_lcp") >= 0L &&
        r.getAs[Long]("max_lcp") <= 64L)
      assert(r.getAs[Long]("n_cross_doc") <=
        r.getAs[Long]("n_dup_pairs"))
    }
  }

  test("q394 JL audit: per-probe mean distance ratio concentrates " +
    "around 1e6 ppm and min <= mean <= max") {
    val rows = SparkEntry.queries("q394_jl_projection_audit")(
      spark, sfDir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val (mn, mx, mean) = (r.getAs[Long]("min_ratio_ppm"),
        r.getAs[Long]("max_ratio_ppm"), r.getAs[Long]("mean_ratio_ppm"))
      assert(mn <= mean && mean <= mx)
      // E[ratio] = 1e6; a 16-dim Rademacher projection concentrates
      // the MEAN over ~200 pairs well within 2x
      assert(mean > 500000L && mean < 2000000L,
        s"mean ratio out of JL band: $mean")
    }
  }

  test("q395 k-core: cores are nested (k+1-core inside k-core), " +
    "min in-core degree >= k when non-empty, edge counts consistent") {
    val rows = SparkEntry.queries("q395_kcore_decomposition")(
      spark, sfDir).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    val sizes = rows.map(_.getAs[Long]("n_core_nodes")).toSeq
    assert(sizes == sizes.sorted.reverse,
      s"a (k+1)-core can never exceed the k-core: $sizes")
    rows.foreach { r =>
      val (k, n, e, md) = (r.getLong(0), r.getAs[Long]("n_core_nodes"),
        r.getAs[Long]("n_core_edges"), r.getAs[Long]("min_core_degree"))
      if (n > 0) {
        assert(md >= k, s"k-core member with degree < k at k=$k")
        assert(e * 2 >= n * k, s"handshake bound violated at k=$k")
      } else assert(e == 0 && md == 0)
    }
  }

  test("q396 ECE: the total is the exact test-weighted gap mean and " +
    "rides every row identically") {
    val rows = SparkEntry.queries("q396_expected_calibration_error")(
      spark, sfDir).collect()
    assert(rows.nonEmpty)
    val eces = rows.map(_.getAs[Long]("ece_ppm")).distinct
    assert(eces.length == 1, "the windowed total must be constant")
    val num = rows.map(r => r.getAs[Long]("n_test") *
      r.getAs[Long]("abs_gap_ppm")).sum
    val den = rows.map(_.getAs[Long]("n_test")).sum
    assert(eces.head == num / den, "ECE must equal the recomputed mean")
  }

  test("q397 Krippendorff: alpha within [-1e6, 1e6] band sanity and " +
    "Do/De consistency with the emitted rationals") {
    val r = SparkEntry.queries("q397_krippendorff_alpha")(spark, sfDir)
      .head()
    val (doN, doD, deN, deD) = (r.getAs[Long]("do_num"),
      r.getAs[Long]("do_den"), r.getAs[Long]("de_num"),
      r.getAs[Long]("de_den"))
    assert(doN >= 0 && doN <= doD, "Do is a proportion")
    assert(deN >= 0 && deN <= deD, "De is a proportion")
    val alpha = r.getAs[Long]("alpha_ppm")
    // alpha = 1 - Do/De can go below -1 only on degenerate margins;
    // with three correlated raters it must sit in a sane band
    assert(alpha >= -2000000L && alpha <= 1000000L, s"alpha: $alpha")
  }

  test("q398 McNemar: cell conservation (both + b + c + neither = n) " +
    "and the significance bit matches the exact inequality") {
    val r = SparkEntry.queries("q398_mcnemar_test")(spark, sfDir).head()
    val (n, both, b, c) = (r.getAs[Long]("n"), r.getAs[Long]("n_both"),
      r.getAs[Long]("b"), r.getAs[Long]("c"))
    assert(both + b + c <= n)
    assert(r.getAs[Long]("significant_5pct") ==
      (if ((b - c) * (b - c) * 1000 > 3841 * (b + c)) 1L else 0L))
  }

  test("q399 KMV: estimates within 30% of exact at k=64, union bounds " +
    "(max singleton <= union <= sum), intersection = incl-excl identity") {
    val rows = SparkEntry.queries("q399_kmv_sketch_algebra")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("est"), r.getAs[Long]("exact"))).toMap
    Seq("click", "purchase", "union").foreach { s0 =>
      val (est, exact) = rows(s0)
      assert(math.abs(est - exact) * 10 <= exact * 3,
        s"KMV k=64 should land within 30% on $s0: est $est vs $exact")
    }
    assert(rows("union")._1 >= math.max(rows("click")._1,
      rows("purchase")._1))
    assert(rows("union")._1 <= rows("click")._1 + rows("purchase")._1)
    assert(rows("intersection")._1 ==
      rows("click")._1 + rows("purchase")._1 - rows("union")._1)
  }

  test("q400 permutation test: p >= 10 milli by construction (the real " +
    "assignment counts itself), 100 perms, placebo max >= |real|") {
    val r = SparkEntry.queries("q400_did_permutation_test")(spark, sfDir)
      .head()
    assert(r.getAs[Long]("n_perms") == 100L)
    assert(r.getAs[Long]("n_as_extreme") >= 1L)
    assert(r.getAs[Long]("p_milli") >= 10L)
    assert(r.getAs[Long]("max_abs_placebo_micros") >=
      math.abs(r.getAs[Long]("did_real_micros")))
  }

  test("q401 log-rank: O1 bounded by total deaths, E1/V positive, " +
    "significance bit matches the exact integer inequality") {
    val r = SparkEntry.queries("q401_logrank_test")(spark, sfDir).head()
    val (o1, e1, v) = (r.getAs[Long]("o1"), r.getAs[Long]("e1_micros"),
      r.getAs[Long]("v_micros"))
    assert(o1 >= 0 && e1 > 0 && v > 0)
    val diff = BigInt(o1) * 1000000 - BigInt(e1)
    assert(r.getAs[Long]("significant_5pct") ==
      (if (diff * diff * 1000 > BigInt(3841) * v * 1000000) 1L else 0L))
  }
}
