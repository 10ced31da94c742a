package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the ML-platform loop (q224–q226) beyond the value
  * oracle: leakage-freedom by construction, audit-partition identity,
  * and the storage-layout win the rows-only gate can't grade.
  */
class FeaturePlatformSpec extends AnyFunSuite {
  import TestSession._

  test("q225 point-in-time join: zero leaks, audit partitions the label " +
    "set, matched mass is positive") {
    val r = SparkEntry.queries("q225_point_in_time_features")(spark, sfDir)
      .head()
    val (labels, cold, matched) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getLong(4) == 0, "a same-day-or-later feature row is target " +
      s"leakage — must be structurally impossible: ${r.getLong(4)}")
    assert(cold + matched == labels,
      s"cold-start + matched must partition the labels: $cold + $matched " +
        s"!= $labels")
    assert(matched > 0 && r.getLong(3) > 0,
      "the fixture has purchase history before signups — matches expected")
  }

  test("q224 recs eval: temporal split respected and rates bounded") {
    val recs = SparkEntry.queries("q224_cooccurrence_recs_eval")(spark, sfDir)
      .collect()
    assert(recs.nonEmpty)
    recs.foreach { r =>
      assert(r.getLong(2) > 0, "a rec must have train support")
      assert(r.getLong(4) <= r.getLong(3), "hits bounded by eval baskets")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
    }
    // eval-basket count per type must equal an independent holdout count
    val cut = lit("2024-01-16").cast("date")
    val expectEval = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct().filter(col("d") >= cut)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    recs.foreach { r =>
      assert(r.getLong(3) == expectEval(r.getString(0)),
        s"${r.getString(0)}: eval baskets ${r.getLong(3)} != holdout " +
          s"${expectEval(r.getString(0))}")
    }
  }

  test("q229 dynamic overwrite touches ONLY the corrected day's partition") {
    // run once so the maintained table exists, then fingerprint every
    // partition file and replay the one-day maintenance pass directly
    SparkEntry.queries("q229_partition_overwrite")(spark, sfDir).collect()
    val root = graft.TempRoots.forDir("graft_partover", sfDir)
      .resolve("table").toFile
    def snap(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    import org.apache.spark.sql.functions._
    val base = snap()
    assert(base.keys.exists(_.contains("d=2024-01-10")),
      "expected the corrected day's partition dir")
    val oneDay = Tables.t(spark, sfDir, "events")
      .filter(to_date(col("ts")) === lit("2024-01-10").cast("date"))
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint) + 1")).as("cents"))
      .select(col("event_type"), col("n"), col("cents"), col("d"))
    graft.Confs.withConf(spark,
      "spark.sql.sources.partitionOverwriteMode", "dynamic") {
      oneDay.write.partitionBy("d").mode("overwrite")
        .parquet(root.getAbsolutePath)
    }
    val maintained = snap()
    val untouchedBefore = base.filterNot(_._1.contains("d=2024-01-10"))
    val untouchedAfter = maintained.filterNot(_._1.contains("d=2024-01-10"))
    assert(untouchedAfter == untouchedBefore,
      "dynamic overwrite of one day must leave every other partition's " +
        "files (paths AND mtimes) untouched")
    assert(maintained.keys.exists(_.contains("d=2024-01-10")))
  }

  test("q226 layout: clustering by MinHash prefix never compresses worse " +
    "than the reproducible shuffle, same corpus both sides") {
    // the REAL sizes (codec-specific, so not in q226's oracle row) come
    // from the shared measurement helper the query itself projects from
    val rows = graft.operators.FeaturePlatform
      .compressionLayoutSizes(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (cb, cn) = rows("clustered")
    val (sb, sn) = rows("shuffled")
    assert(cn == sn, "both layouts must hold the whole corpus")
    assert(cb <= sb,
      s"similar-docs-adjacent must not lose: clustered $cb vs shuffled $sb")
    info(f"clustered saves ${(sb - cb) * 10000 / sb} bp of ${sb} bytes")
    // and the promoted oracle row reports exactly that verdict
    val r = SparkEntry.queries("q226_compression_layout")(spark, sfDir).head()
    assert(r.getLong(0) == cn && r.getLong(1) == sn && r.getBoolean(2))
  }

  test("q235 MRR: metric algebra bounded by its own hit counts") {
    val r = SparkEntry.queries("q235_mrr_eval")(spark, sfDir).head()
    val (n, h1, h3, mrr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && h1 <= h3 && h3 <= n,
      s"hit counts must nest: $h1 <= $h3 <= $n")
    // every @1 hit contributes exactly 1e6, every other hit in (0, 1e6),
    // misses 0 — so MRR sits strictly inside these integer envelopes
    assert(mrr >= h1 * 1000000L / n - 1,
      s"mrr $mrr below the hits@1 floor")
    assert(mrr <= h3 * 1000000L / n,
      s"mrr $mrr above the hits@3 ceiling")
  }

  test("q236 bins partition the orders exactly, in order, near-equal " +
    "mass up to bucket granularity") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q236_feature_binning")(spark, sfDir)
      .collect()
    val total = Tables.t(spark, sfDir, "orders").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "bins must partition the corpus — no dropped or doubled orders")
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq,
      "bin ids must be dense from 0")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) < b.getLong(2),
        s"bucket ranges must be disjoint and ordered: bin ${a.getLong(0)} " +
          s"hi ${a.getLong(3)} vs bin ${b.getLong(0)} lo ${b.getLong(2)}")
    case _ => ()
    }
    // equal-frequency up to the mass of one $100 bucket (the documented
    // granularity contract)
    val maxBucket = Tables.t(spark, sfDir, "orders")
      .select(expr("cast(round(o_totalprice * 100) as bigint) div 10000")
        .as("b"))
      .groupBy("b").count().agg(max("count")).head().getLong(0)
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - total / 10) <= maxBucket,
        s"bin ${r.getLong(0)} mass ${r.getLong(1)} strays more than one " +
          s"bucket ($maxBucket) from ${total / 10}")
    }
  }

  test("q237 target encoding: smoothing pulls every category toward the " +
    "global prior, never past it") {
    val rows = SparkEntry.queries("q237_target_encoding")(spark, sfDir)
      .collect()
    val n = rows.map(_.getLong(1)).sum
    val s = rows.map(_.getLong(2)).sum
    val priorBp = s * 10000 / n
    rows.foreach { r =>
      val (raw, enc) = (r.getLong(3), r.getLong(4))
      val (lo, hi) = (math.min(raw, priorBp), math.max(raw, priorBp))
      // ±1 absorbs the two independent integer floors
      assert(enc >= lo - 1 && enc <= hi + 1,
        s"cat ${r.getLong(0)}: enc $enc outside [$lo, $hi] " +
          s"(raw $raw, prior $priorBp)")
      // and with m=100 pseudo-counts the pull is real: a category far
      // from the prior must move strictly toward it
      if (math.abs(raw - priorBp) > 200)
        assert(math.abs(enc - priorBp) < math.abs(raw - priorBp),
          s"cat ${r.getLong(0)}: smoothing failed to shrink $raw -> $enc " +
            s"toward $priorBp")
    }
  }

  test("q245 quantile transform: covers every order, monotone in the " +
    "bucket, strictly below 1e6") {
    val rows = SparkEntry.queries("q245_quantile_normalization")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == Tables.t(spark, sfDir, "orders").count())
    assert(rows.map(_._1).distinct.length == rows.length, "one row per order")
    val byBucket = rows.groupBy(_._2).map { case (b, rs) =>
      assert(rs.map(_._3).distinct.length == 1,
        s"bucket $b must map to ONE percentile")
      b -> rs.head._3
    }.toSeq.sortBy(_._1)
    byBucket.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, "pct must be monotone in the bucket")
      case _ => ()
    }
    assert(byBucket.head._2 == 0L && byBucket.last._2 < 1000000L)
  }

  test("q246 winsorize: thresholds are exact counting percentiles and " +
    "the clip ledger reconciles with a raw recount") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q246_winsorize")(spark, sfDir).collect()
    val (p01, p99) = (rows.head.getLong(5), rows.head.getLong(6))
    assert(rows.forall(r => r.getLong(5) == p01 && r.getLong(6) == p99),
      "thresholds are global, identical on every flag row")
    assert(p01 < p99)
    val cents = Tables.t(spark, sfDir, "lineitem")
      .selectExpr("cast(round(l_extendedprice * 100) as bigint) as c")
      .collect().map(_.getLong(0))
    val n = cents.length.toLong
    // counting-percentile definition: at least 1% of mass at or below
    // p01, strictly less than 1% strictly below it (q168's inverse CDF)
    assert(cents.count(_ <= p01) * 100L >= n)
    assert(cents.count(_ < p01) * 100L < n)
    assert(cents.count(_ <= p99) * 100L >= 99L * n)
    assert(cents.count(_ < p99) * 100L < 99L * n)
    assert(rows.map(_.getLong(2)).sum == cents.count(_ < p01),
      "clipped-low ledger must equal the raw recount")
    assert(rows.map(_.getLong(3)).sum == cents.count(_ > p99))
    assert(rows.map(_.getLong(4)).sum ==
      cents.map(c => math.max(p01, math.min(p99, c))).sum,
      "winsorized sum must equal clamping every raw value")
  }

  test("q247 RFM: segments partition purchasing users; tertile labels " +
    "stay in range; monetary ledger conserves") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q247_rfm_segmentation")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val buyers = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == buyers,
      "every purchasing user lands in exactly one segment")
    assert(rows.forall(_._1.matches("R[0-2]F[0-2]M[0-2]")),
      s"segment labels malformed: ${rows.map(_._1).mkString(",")}")
    val totalCents = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("cast(round(value * 100) as bigint)")))
      .head().getLong(0)
    assert(rows.map(_._3).sum == totalCents,
      "segment monetary totals must conserve the corpus revenue")
  }

  test("q252 conformal: internal bp consistency and weighted coverage " +
    "in the conformal envelope") {
    val rows = SparkEntry.queries("q252_conformal_interval")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val q90 = rows.head._5
    assert(rows.forall(_._5 == q90), "the conformal radius is global")
    assert(q90 > 0)
    rows.foreach { case (ch, n, cov, bp, _) =>
      assert(cov <= n && bp == cov * 10000 / n,
        s"ch $ch: coverage ledger inconsistent ($cov/$n vs $bp bp)")
    }
    val (nAll, covAll) = (rows.map(_._2).sum, rows.map(_._3).sum)
    val overall = covAll * 10000 / nAll
    // split-conformal at alpha=0.1 targets 9000 bp; finite-sample noise
    // at the fixture's test size stays well inside this envelope
    assert(overall >= 7500 && overall <= 10000,
      s"overall coverage $overall bp outside the conformal envelope")
    info(s"conformal coverage: $overall bp (target 9000)")
  }

  test("q257 streaming coverage monitor reconciles exactly with q252's " +
    "batch audit — same model, same radius, same totals") {
    val stream = SparkEntry
      .queries("q257_stream_conformal_monitor")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    val batch = SparkEntry.queries("q252_conformal_interval")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(stream.map(_._3).distinct.toSeq == batch.map(_._3).distinct.toSeq,
      "monitor and test must share ONE conformal radius")
    assert(stream.map(_._1).sum == batch.map(_._1).sum &&
      stream.map(_._2).sum == batch.map(_._2).sum,
      "per-day and per-channel ledgers must cover the same test set: " +
        s"${stream.map(_._1).sum}/${stream.map(_._2).sum} vs " +
        s"${batch.map(_._1).sum}/${batch.map(_._2).sum}")
  }

  test("q254 composition tree: children sum EXACTLY to their parent at " +
    "every level") {
    val rows = SparkEntry.queries("q254_composition_tree")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val total = rows.filter(_._1 == "total")
    assert(total.length == 1 && total.head._5 == 10000L)
    val srcRows = rows.filter(_._1 == "source")
    val leafRows = rows.filter(_._1 == "source_lang")
    assert(srcRows.map(_._4).sum == total.head._4,
      "source masses must sum to the root")
    srcRows.foreach { case (_, src, _, chars, _) =>
      val kids = leafRows.filter(_._2 == src).map(_._4).sum
      assert(kids == chars, s"$src: leaves sum $kids != parent $chars")
    }
    // shares telescope up to integer floors: each source's leaf shares
    // sum within |langs| of 10000
    srcRows.foreach { case (_, src, _, _, _) =>
      val shareSum = leafRows.filter(_._2 == src).map(_._5).sum
      val k = leafRows.count(_._2 == src)
      assert(shareSum <= 10000 && shareSum >= 10000 - k,
        s"$src: leaf shares sum $shareSum with $k children")
    }
  }

  test("q267 AUC: rational identities hold and the channel model has no " +
    "ranking power on the independence fixture") {
    val r = SparkEntry.queries("q267_group_auc")(spark, sfDir).head()
    val (nPos, nNeg, num, den, bp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(den == 2 * nPos * nNeg)
    assert(num >= 0 && num <= den, s"AUC rational $num/$den out of [0,1]")
    assert(bp == num * 10000 / den)
    // events are synthetic with channel independent of conversion, so
    // the channel-rate model must score near chance — the honest
    // negative control for the metric itself (a buggy tie handling
    // typically lands far from 0.5 because half-credit mass vanishes)
    assert(bp > 4000 && bp < 6000, s"expected ~chance AUC, got $bp bp")
  }

  test("q268 compaction: bins conserve bytes, respect the one-file " +
    "overshoot bound, and fill near target") {
    val rows = SparkEntry.queries("q268_compaction_planner")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = Tables.t(spark, sfDir, "documents")
      .agg(sum(col("n_chars"))).head().getLong(0)
    assert(rows.map(_._3).sum == total, "plan must conserve bytes")
    val target = rows.head._5
    rows.foreach { case (bin, n, bytes, largest, t, fillBp) =>
      assert(t == target)
      assert(largest <= bytes)
      assert(fillBp == bytes * 10000 / t)
      // cumsum packing: a bin ends because the NEXT file crossed the
      // boundary, so overshoot is bounded by its largest member
      assert(bytes <= t + largest,
        s"bin $bin bytes $bytes exceeds target $t + largest $largest")
    }
    // all but the tail bin must reach at least half fill on this corpus
    rows.init.foreach { case (bin, _, _, _, _, fillBp) =>
      assert(fillBp >= 5000, s"bin $bin underfilled: $fillBp bp")
    }
  }

  test("q276 nDCG: model DCG never exceeds the ideal and the metric " +
    "stays in [0, 10000] bp") {
    val rows = SparkEntry.queries("q276_ndcg_eval")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dcg, idcg) = (r.getLong(1), r.getLong(2))
      assert(dcg >= 0 && idcg >= dcg,
        s"ideal ranking must dominate the model ranking: $r")
      if (idcg > 0) {
        val bp = r.getLong(3)
        assert(bp >= 0 && bp <= 10000, s"ndcg_bp out of range: $r")
        assert(bp == dcg * 10000 / idcg)
      } else assert(r.isNullAt(3))
    }
  }

  test("q285 isotonic fit is monotone nondecreasing, bands match q228, " +
    "and pooling only moves rates toward violating neighbors") {
    val iso = SparkEntry.queries("q285_isotonic_calibration")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(4)))
    assert(iso.nonEmpty)
    // the property the raw reliability table lacks by construction
    iso.sliding(2).foreach {
      case Array((b1, _, _, i1), (b2, _, _, i2)) =>
        assert(i1 <= i2, s"iso_bp not monotone: band $b1=$i1 > band $b2=$i2")
      case _ =>
    }
    val rawBands = SparkEntry.queries("q228_conversion_calibration")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(iso.map(_._1).toSet == rawBands,
      "the fit must cover exactly the reliability table's bands")
    // where the raw rates are already increasing, PAV is the identity
    val rawRates = iso.map(t => t._1 -> t._3).toMap
    iso.foreach { case (b, _, rawBp, isoBp) =>
      val prevViol = rawRates.filter(_._1 < b).exists(_._2 > rawBp)
      val nextViol = rawRates.filter(_._1 > b).exists(_._2 < rawBp)
      if (!prevViol && !nextViol)
        assert(isoBp == rawBp,
          s"band $b is not in any violating block but iso moved it: " +
            s"$rawBp -> $isoBp")
    }
  }
}
