package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the experimentation/causal module (q208–q215) that the
  * value-equality oracle can't see: credit conservation, cross-query
  * agreement, statistic algebra vs an independent float computation, and
  * the compression kernel's ordering properties.
  */
class ExperimentationSpec extends AnyFunSuite {
  import TestSession._

  test("q213 conserves revenue to the cent and agrees with q210 on organic") {
    val credits = SparkEntry.queries("q213_linear_attribution")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val totalCents = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(round(value * 100) as bigint)")))
      .head().getLong(0)
    assert(credits.values.map(_._2).sum == totalCents,
      s"linear attribution must conserve revenue exactly: " +
        s"${credits.values.map(_._2).sum} vs $totalCents")
    val lastTouch = SparkEntry
      .queries("q210_last_touch_attribution")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // both definitions of 'no click within 24 h' must agree
    assert(credits.get("organic").map(_._1) == lastTouch.get("organic"),
      s"organic purchase sets diverge: ${credits.get("organic")} vs " +
        s"${lastTouch.get("organic")}")
    // last-touch total conversions == number of purchases (each purchase
    // resolves to exactly one channel)
    val nPurchases = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(lastTouch.values.sum == nPurchases)
  }

  test("q208 exact z^2 matches an independent float computation") {
    val r = SparkEntry.queries("q208_ab_test")(spark, sfDir).head()
    val (na, ca, nb, cb) =
      (r.getLong(0).toDouble, r.getLong(1).toDouble,
        r.getLong(2).toDouble, r.getLong(3).toDouble)
    val (p1, p2, p) = (ca / na, cb / nb, (ca + cb) / (na + nb))
    val z2 = math.pow(p1 - p2, 2) / (p * (1 - p) * (1 / na + 1 / nb))
    // num/den emit as canonical digit strings since the round-8
    // decimal-representation hash lesson; parse them back exactly
    val exact = BigDecimal(r.getString(6)) / BigDecimal(r.getString(7))
    assert((exact.toDouble - z2).abs < 1e-9 * math.max(z2, 1.0),
      s"rational z^2 ${exact.toDouble} vs float $z2")
    assert(r.getBoolean(8) == (z2 > 3.841459))
  }

  test("q215 CUPED: rho2 bounded, adjusted e4 views consistent with the " +
    "rationals, and theta matches float OLS") {
    val r = SparkEntry.queries("q215_cuped_adjustment")(spark, sfDir).head()
    val (tn, td) = (BigDecimal(r.getString(4)), BigDecimal(r.getString(5)))
    val (an, ad) = (BigDecimal(r.getString(6)), BigDecimal(r.getString(7)))
    val rho2bp = r.getLong(8)
    assert(rho2bp >= 0 && rho2bp <= 10000,
      s"rho^2 is a squared correlation — must be in [0, 1]: $rho2bp bp")
    // the e4 fixed-point views must be the truncated rationals
    def trunc(n: BigDecimal, d: BigDecimal): Long =
      (n * 10000 / d).setScale(0, BigDecimal.RoundingMode.DOWN).toLong
    assert(r.getLong(3) == trunc(an, ad),
      s"adj_diff_e4 ${r.getLong(3)} != trunc(num/den) ${trunc(an, ad)}")
    // independent float theta over the same (x, y) per-user frame
    val u = Tables.t(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(expr("ts < timestamp'2024-01-16 00:00:00'") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("x"),
        sum(when(expr("ts >= timestamp'2024-01-16 00:00:00'") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .select(col("x").cast("double"), col("y").cast("double"))
      .collect().map(r0 => (r0.getDouble(0), r0.getDouble(1)))
    val n = u.length.toDouble
    val (sx, sy) = (u.map(_._1).sum, u.map(_._2).sum)
    val sxy = u.map(p => p._1 * p._2).sum
    val sxx = u.map(p => p._1 * p._1).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(((tn / td).toDouble - theta).abs < 1e-9,
      s"rational theta ${(tn / td).toDouble} vs float $theta")
  }

  test("q212 SRM arms partition the distinct-user universe") {
    val r = SparkEntry.queries("q212_srm_check")(spark, sfDir).head()
    val users = Tables.t(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users)
    assert(r.getLong(2) >= 0)
  }

  test("q211 matched pairs: same stratum, disjoint 1:1 use, arms correct") {
    val rows = SparkEntry.queries("q211_matched_controls")(spark, sfDir)
      .collect()
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        expr("n_chars div 64").as("bucket"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    val (treats, ctls) = (rows.map(_.getLong(2)), rows.map(_.getLong(3)))
    assert(treats.distinct.length == treats.length, "a treat doc paired twice")
    assert(ctls.distinct.length == ctls.length, "a control doc paired twice")
    rows.foreach { r =>
      val (t, c) = (docs(r.getLong(2)), docs(r.getLong(3)))
      assert(t._1.length == 4 && c._1.length == 5,
        s"arm mixup: treat ${t._1} control ${c._1}")
      assert(t._2 == c._2 && t._3 == c._3 && t._2 == r.getString(0),
        s"stratum mismatch: $t vs $c vs ${r.getString(0)}")
    }
  }

  test("q214 deflate kernel: deterministic, ordered repetitive < prose < " +
    "noise, flag consistent") {
    import spark.implicits._
    val a = SparkEntry.queries("q214_compression_quality")(spark, sfDir)
      .collect()
    val b = SparkEntry.queries("q214_compression_quality")(spark, sfDir)
      .collect()
    assert(a.sameElements(b), "deflate length must be deterministic")
    a.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
      assert(r.getBoolean(4) == (r.getLong(3) < 2500))
    }
    // ordering property on synthetic extremes, through the same kernel
    val probe = Seq(
      ("rep", "ab" * 500),
      ("prose", ("the quick brown fox jumps over the lazy dog and then " +
        "discusses distributed query optimization at length ") * 10),
      ("noise", (1 to 1000).map(i =>
        ((i * 2654435761L >>> 7) % 94 + 33).toChar).mkString))
      .toDF("kind", "text")
      .select(col("kind"),
        (graft.catalyst.VecOps.deflate_len(col("text")) * 10000 /
          length(col("text"))).cast("long").as("bp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probe("rep") < probe("prose") && probe("prose") < probe("noise"),
      s"compressibility ordering violated: $probe")
  }

  test("q240 KS: D matches an independent float ECDF sweep and the " +
    "rejection bit replays in BigInt") {
    val r = SparkEntry.queries("q240_ks_drift")(spark, sfDir).head()
    val (n1, n2, dPpm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // independent recomputation from the same bucketed samples
    val buckets = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).as("arm"),
        expr("cast(round(value * 100) as bigint) div 100").as("b"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val s1 = buckets.filter(_._1 == 0L).map(_._2).sorted
    val s2 = buckets.filter(_._1 == 1L).map(_._2).sorted
    assert(s1.length == n1 && s2.length == n2)
    val dom = (s1 ++ s2).distinct.sorted
    val dFloat = dom.map { x =>
      math.abs(s1.count(_ <= x).toDouble / n1 - s2.count(_ <= x).toDouble / n2)
    }.max
    assert(math.abs(dPpm / 1e6 - dFloat) <= 1e-6,
      s"integer D ${dPpm / 1e6} vs float sweep $dFloat")
    val dNum = dom.map(x =>
      (BigInt(s1.count(_ <= x)) * n2 - BigInt(s2.count(_ <= x)) * n1).abs).max
    val reject = dNum * dNum * 1000000 >
      BigInt(1844164) * n1 * n2 * (n1 + n2)
    assert(r.getBoolean(4) == reject,
      s"significance bit diverged from the BigInt replay")
  }

  test("q238 Benford audit: digits partition the sample and observed " +
    "ppm telescopes to 1e6") {
    val rows = SparkEntry.queries("q238_benford_audit")(spark, sfDir)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9),
      "all nine digits must be present (absent = 0-count rows)")
    val totalObs = rows.map(_.getLong(1)).sum
    val positives = Tables.t(spark, sfDir, "lineitem")
      .filter(expr("cast(round(l_extendedprice * 100) as bigint) > 0"))
      .count()
    assert(totalObs == positives, "every positive price gets one digit")
    val ppmSum = rows.map(_.getLong(2)).sum
    // 9 independent integer floors lose at most 8 ppm
    assert(ppmSum >= 1000000L - 8 && ppmSum <= 1000000L,
      s"observed ppm must telescope to ~1e6, got $ppmSum")
    assert(rows.map(_.getLong(3)).sum == 1000000L,
      "the Benford constants must sum to exactly 1e6")
  }

  test("q251 position attribution: conserves revenue to the cent and " +
    "shares the touch universe with q213 exactly") {
    val pos = SparkEntry.queries("q251_position_attribution")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val totalCents = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(round(value * 100) as bigint)")))
      .head().getLong(0)
    assert(pos.values.map(_._2).sum == totalCents,
      s"U-shaped credit must conserve revenue exactly: " +
        s"${pos.values.map(_._2).sum} vs $totalCents")
    // identical touch set and organic fallback as the linear model —
    // only the split rule differs, so per-channel touch COUNTS match
    val lin = SparkEntry.queries("q213_linear_attribution")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pos.map { case (ch, (n, _)) => ch -> n } == lin,
      s"touch universes diverged: ${pos.view.mapValues(_._1).toMap} vs $lin")
  }

  test("q284 time-decay attribution: conserves revenue to the cent and " +
    "shares the touch universe with q213 exactly") {
    val dec = SparkEntry.queries("q284_time_decay_attribution")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val totalCents = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(round(value * 100) as bigint)")))
      .head().getLong(0)
    assert(dec.values.map(_._2).sum == totalCents,
      s"time-decay credit must conserve revenue exactly: " +
        s"${dec.values.map(_._2).sum} vs $totalCents")
    val lin = SparkEntry.queries("q213_linear_attribution")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dec.map { case (ch, (n, _)) => ch -> n } == lin,
      s"touch universes diverged: ${dec.view.mapValues(_._1).toMap} vs $lin")
  }

  test("q256 Gini split: the whole 99-candidate search replays in " +
    "BigInt and the winner really is the argmin") {
    val r = SparkEntry.queries("q256_gini_split")(spark, sfDir).head()
    val hist = Tables.t(spark, sfDir, "events")
      .selectExpr("cast(get_json_object(props, '$.k') as bigint) as x",
        "case when event_type = 'purchase' then 1 else 0 end as y")
      .groupBy("x")
      .agg(count(lit(1)).as("cn"), sum(col("y")).as("pos"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    val n = hist.map(_._2).sum
    val p = hist.map(_._3).sum
    var (nl, pl) = (0L, 0L)
    val scores = hist.dropRight(1).map { case (x, cn, pos) =>
      nl += cn; pl += pos
      val (nr, pr) = (n - nl, p - pl)
      val s0 = BigInt(pl) * (nl - pl) * 1000000 / nl +
        BigInt(pr) * (nr - pr) * 1000000 / nr
      (x, nl, pl, nr, pr, s0.toLong)
    }
    val best = scores.minBy(s => (s._6, s._1))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == best,
      s"split search replay mismatch: query $r vs replay $best")
    assert(scores.forall(_._6 >= best._6))
  }

  test("q244 bootstrap: interval brackets the point estimate and the " +
    "whole resample schedule replays exactly in plain Scala") {
    val r = SparkEntry.queries("q244_bootstrap_ci")(spark, sfDir).head()
    val (n, b, mean, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    assert(b == 200)
    assert(lo <= mean && mean <= hi,
      s"CI [$lo, $hi] must bracket the point mean $mean")
    assert(lo < hi, "a 200-resample CI on continuous amounts can't be flat")
    // independent replay: same deterministic mix, plain Scala arithmetic
    val cents = Tables.t(spark, sfDir, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("cast(round(value * 100) as bigint) as c", "event_id")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(identity).map(_._1)
    assert(cents.length == n)
    val M = 2147483647L
    val means = (0 until 200).map { bb =>
      var tot = 0L
      var j = 0
      while (j < cents.length) {
        val s0 = (bb * 1000003L + j) % M
        val idx = ((s0 * s0 + s0 * 48271L) % M) % cents.length
        tot += cents(idx.toInt)
        j += 1
      }
      tot / cents.length
    }.sorted
    // q168 counting rule: smallest mean with rank*1000 >= pct*B
    def pick(pct: Int): Long =
      means.zipWithIndex.collectFirst {
        case (m, i) if (i + 1) * 1000 >= pct * 200 => m
      }.get
    assert(pick(25) == lo && pick(975) == hi,
      s"replayed CI (${pick(25)}, ${pick(975)}) != query ($lo, $hi)")
  }

  test("q259 DiD: cells partition the purchases and the estimate matches " +
    "an independent float computation to floor tolerance") {
    val r = SparkEntry.queries("q259_diff_in_diff")(spark, sfDir).head()
    val ns = (0 to 3).map(r.getLong)
    val nPurchases = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(ns.sum == nPurchases,
      s"(arm, period) cells must partition purchases: ${ns.sum} vs $nPurchases")
    // independent float DiD over the same split rule
    val p = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id % 2 as treat",
        "datediff(cast(ts as date), date '1970-01-01') as d",
        "cast(round(value * 100) as bigint) as cents")
      .collect().map(x => (x.getLong(0), x.getInt(1).toLong, x.getLong(2)))
    val mid = (p.map(_._2).min + p.map(_._2).max) / 2
    def mean(t: Long, post: Boolean): Double = {
      val c = p.filter(x => x._1 == t && (x._2 > mid) == post).map(_._3)
      c.sum.toDouble / c.length
    }
    val did = (mean(1, post = true) - mean(1, post = false)) -
      (mean(0, post = true) - mean(0, post = false))
    // four independent micro-floors → at most 4 micro-cents of drift
    assert((r.getLong(8) - did * 1e6).abs <= 4.0,
      s"did_micros ${r.getLong(8)} vs float ${did * 1e6}")
  }

  test("q265 IPS: the per-channel terms sum to the policy value and the " +
    "empirical propensities explain the matched fractions") {
    val rows = SparkEntry.queries("q265_ips_policy_eval")(spark, sfDir)
      .collect()
    assert(rows.length == 4)
    // ips_value_ppm is the sum of the per-channel terms, on every row
    val terms = rows.map(_.getLong(5)).sum
    rows.foreach(r => assert(r.getLong(6) == terms))
    rows.foreach { r =>
      val (nLogged, nMatched, convAll, convMatched) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(convMatched <= nMatched && nMatched <= nLogged)
      assert(convAll <= nLogged)
      // the term is exactly conv_matched/n_logged in ppm (floored)
      assert(r.getLong(5) == convMatched * 1000000L / nLogged)
    }
    // pi(user) = user_id % 4 matches ~1/4 of clicks overall — user id
    // and channel are independent in the fixtures (per-channel fractions
    // are too noisy at sf0.001's ~50-click channels to pin)
    val frac = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    assert(frac > 0.15 && frac < 0.35,
      s"aggregate matched fraction should sit near 1/4: $frac")
  }

  test("q266 record linkage: true pairs separate cleanly from in-block " +
    "noise and every master id links") {
    val rows = SparkEntry.queries("q266_record_linkage")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nCust = Tables.t(spark, sfDir, "customer").count()
    assert(rows.map(_._3).sum == nCust,
      "every customer's dirty twin must land in its own block (same " +
        "nation+segment), so true pairs total the customer count")
    // separation: the balance+tail fields (75 points) only co-occur on
    // true pairs; false pairs stay at or below 65
    rows.filter(_._1 >= 75).foreach { case (s0, n, t) =>
      assert(n == t, s"score $s0 must be pure true pairs: $n vs $t")
    }
    rows.filter(_._1 < 75).foreach { case (s0, _, t) =>
      assert(t == 0, s"no true pair may fall below 75: score $s0 has $t")
    }
    // the noise floor exists (blocking produces candidate pairs at all)
    assert(rows.filter(_._1 < 75).map(_._2).sum > 0,
      "blocks must generate non-trivial candidate comparisons")
  }

  test("q269 bandit replay: regret telescopes, cold start explores each " +
    "arm at most once, hindsight arm is a constant") {
    val rows = SparkEntry.queries("q269_bandit_replay")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // cum_regret is exactly the running sum of the per-day gaps
    var run = 0L
    rows.foreach { r =>
      run += r.getLong(5) - r.getLong(3)
      assert(r.getLong(6) == run,
        s"cum_regret_micro must telescope at ${r.getDate(0)}")
    }
    // cold start: day 1 always picks arm 0 at the optimistic score (no
    // arm has history), and optimistic picks can't dominate the horizon
    // (an arm leaves cold-start state as soon as a click lands on it)
    assert(rows.head.getLong(1) == 0L &&
      rows.head.getLong(2) == 1000001L,
      "day 1 must be the deterministic optimistic pull of arm 0")
    val optimistic = rows.count(_.getLong(2) == 1000001L)
    assert(optimistic < rows.length / 2,
      s"cold-start pulls should be a handful, got $optimistic")
    // the hindsight-best arm is a single constant column
    assert(rows.map(_.getLong(4)).distinct.length == 1)
  }

  test("q260 sequential monitor: final look equals q208's totals and " +
    "first_cross marks exactly the earliest crossing") {
    val looks = SparkEntry.queries("q260_sequential_ab_monitor")(spark, sfDir)
      .collect()
    val last = looks.last
    val q208 = SparkEntry.queries("q208_ab_test")(spark, sfDir).head()
    // cumulative counts at the final day == the single-look totals
    assert((1 to 4).map(last.getLong) == (0 to 3).map(q208.getLong),
      "final-look cumulative counts must equal q208's totals")
    val crosses = looks.map(_.getBoolean(7))
    assert(crosses.count(identity) <= 1, "at most one first_cross")
    val firstTrue = looks.indexWhere(_.getBoolean(6))
    if (firstTrue >= 0)
      assert(crosses(firstTrue) && crosses.take(firstTrue).forall(!_),
        "first_cross must be the earliest cross_95 day")
    else assert(!crosses.exists(identity))
    // the Pocock bar is strictly stricter than the single-look bar
    looks.filter(_.getBoolean(6)).foreach { l =>
      assert(l.getLong(5) > 8352100L,
        s"crossed look must have z2_micro above the Pocock boundary: $l")
    }
  }
}
