package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the sequential/longitudinal module (q216–q219) the
  * value-equality oracle can't see: the CUSUM window identity vs the
  * serial recurrence, the HLL rolling estimate vs q203's exact count,
  * and the bounded-carry property of the sequence builder.
  */
class SequentialSpec extends AnyFunSuite {
  import TestSession._

  test("q217 prefix-sum/running-min identity equals the serial CUSUM " +
    "recurrence, and the drift k is the exact integer mean") {
    val rows = SparkEntry.queries("q217_cusum_changepoint")(spark, sfDir)
      .collect()
    val cents = rows.map(_.getLong(1))
    val k = cents.sum / cents.length
    assert(rows.forall(_.getLong(2) == k),
      s"drift k must be total div n_days = $k")
    // the textbook serial recurrence S_t = max(0, S_{t-1} + x_t - k)
    var s = 0L
    rows.foreach { r =>
      s = math.max(0L, s + r.getLong(1) - k)
      assert(r.getLong(3) == s,
        s"day ${r.get(0)}: windowed CUSUM ${r.getLong(3)} != recurrence $s")
      assert(r.getBoolean(4) == (s > k))
    }
    // uniform fixture traffic should not all sit above threshold
    assert(rows.exists(!_.getBoolean(4)), "every day alarming is degenerate")
  }

  test("q218 HLL rolling WAU: row-aligned with q203 and every estimate " +
    "within sketch error of the exact distinct count") {
    val exact = SparkEntry.queries("q203_rolling_active_users")(spark, sfDir)
      .collect().map(r => r.get(0).toString -> r.getLong(2)).toMap
    val est = SparkEntry.queries("q218_rolling_wau_hll")(spark, sfDir)
      .collect()
    assert(est.map(_.get(0).toString).toSet == exact.keySet,
      "sketch path must produce exactly q203's window-end days")
    est.foreach { r =>
      val d = r.get(0).toString
      val e = r.getLong(1).toDouble
      val x = exact(d).toDouble
      // lgK=12 → relative standard error ~1.6%; 5% is >3 sigma
      assert(math.abs(e - x) <= math.max(0.05 * x, 3.0),
        s"day $d: HLL $e vs exact $x drifts past 5%")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 7)
    }
  }

  test("q231 capped sessions: every session respects the 4 h cap, " +
    "splits are justified, counts conserve") {
    val GAP = 7200000000L; val CAP = 14400000000L
    val rows = SparkEntry.queries("q231_capped_sessions")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.foreach { case (u, _, s0, e0, _) =>
      assert(e0 - s0 <= CAP, s"user $u: session spans ${e0 - s0} > cap")
    }
    rows.groupBy(_._1).foreach { case (u, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, s1, e1, _), (_, _, s2, _, _)) =>
          // a split is caused by the gap OR by the cap — never spurious
          assert(s2 - e1 > GAP || s2 - s1 > CAP,
            s"user $u: unjustified split (gap ${s2 - e1}, span ${s2 - s1})")
        case _ =>
      }
    }
    val totals = Tables.t(spark, sfDir, "events")
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUser = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum)
    assert(perUser.toMap == totals,
      "session event counts must conserve per user")
    // the cap branch, proven to FIRE on a planted fixture (sf0.001's
    // sparse traffic never triggers it there — sf0.01/0.1, where it
    // splits sessions, are covered bit-exactly by the driver oracle):
    // 10 events 1 h apart → the 2 h gap never splits, the 4 h cap must
    // split into exactly [0..4h] and [5h..9h]
    import spark.implicits._
    val dir = graft.TempRoots.freshForDir("graft_capfire", "synth").toString
    (0 until 10).map { h =>
      (h.toLong, java.time.LocalDateTime.of(2024, 1, 5, h, 0, 0),
        7L, "view", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = SparkEntry.queries("q231_capped_sessions")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val h = 3600000000L
    val t0 = java.time.LocalDateTime.of(2024, 1, 5, 0, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(planted.toSeq ==
      Seq((t0, t0 + 4 * h, 5L), (t0 + 5 * h, t0 + 9 * h, 5L)),
      s"cap must split the 10-hour run at the 4 h boundary: " +
        planted.mkString(", "))
  }

  test("q216 bounds the carry at K=8 and matches per-user event counts") {
    val rows = SparkEntry.queries("q216_user_sequences")(spark, sfDir)
      .collect()
    val totals = Tables.t(spark, sfDir, "events")
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == totals.size, "one sequence row per user")
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(n == math.min(8L, totals(r.getLong(0))),
        s"user ${r.getLong(0)}: n_recent $n")
      assert(r.getString(2).split(">", -1).length == n,
        "seq must contain exactly n_recent events")
      assert(r.getLong(3) <= r.getLong(4), "span endpoints ordered")
    }
  }

  test("q239 seasonal baseline scores exactly the days with a same-" +
    "weekday predecessor, MAE consistent with its own sums") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q239_seasonal_baseline")(spark, sfDir)
      .collect()
    val days = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(to_date(col("ts"))).distinct()
      .collect().map(_.getDate(0).toLocalDate).toSet
    val scored = days.count(d => days.contains(d.minusDays(7)))
    assert(rows.map(_.getLong(1)).sum == scored,
      s"n_days must count exactly the days whose d-7 exists " +
        s"(${rows.map(_.getLong(1)).sum} vs $scored)")
    rows.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 7, "ISO weekday range")
      assert(r.getLong(3) == r.getLong(2) / r.getLong(1),
        "mae must be the integer mean of its own sum")
    }
  }

  test("q241 Kaplan-Meier: curve monotone, risk sets telescope, deaths " +
    "exclude exactly the censored users, fold replays in BigInt") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q241_survival_curve")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // survival is non-increasing and starts at most at 1e6
    rows.map(_._4).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"survival must not rise: $a -> $b")
      case _ => ()
    }
    assert(rows.head._4 <= 1000000L)
    // risk sets shrink strictly between observed durations (each row's
    // mass leaves the risk set after its t)
    rows.toSeq.sliding(2).foreach {
      case Seq((t1, n1, _, _), (t2, n2, _, _)) =>
        assert(n2 < n1,
          s"risk set must shrink strictly between observed t=$t1,$t2")
      case _ => ()
    }
    // deaths across the curve = uncensored users; total mass = cohort
    val ev = Tables.t(spark, sfDir, "events")
    val horizon = ev.agg(max(to_date(col("ts")))).head().getDate(0)
      .toLocalDate
    val lastDays = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", to_date(col("ts"))))
        .as("e"), max(to_date(col("ts"))).as("l"))
      .filter(col("e").isNotNull)
      .collect()
      .map(_.getDate(2).toLocalDate)
    val cohort = lastDays.length.toLong
    assert(rows.head._2 == cohort, "t=0 risk set must be the whole cohort")
    val uncensored = lastDays.count { l =>
      java.time.temporal.ChronoUnit.DAYS.between(l, horizon) >= 3
    }
    assert(rows.map(_._3).sum == uncensored,
      s"deaths ${rows.map(_._3).sum} must equal uncensored $uncensored")
    // BigInt replay of the per-step floored product
    var acc = BigInt(1000000)
    rows.foreach { case (_, n, d, surv) =>
      acc = acc * (n - d) / n
      assert(acc == surv, s"fold diverged at n=$n d=$d: $acc vs $surv")
    }
  }

  test("q243 window funnel: histogram partitions users and level sets " +
    "nest") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q243_window_funnel")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val users = Tables.t(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.values.sum == users,
      "every user lands in exactly one funnel level")
    val signupUsers = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    // levels >= 1 are exactly the users with a signup
    assert(rows.filter(_._1 >= 1).values.sum == signupUsers,
      "level >= 1 must equal the signup-user set")
    rows.keys.foreach(k => assert(k >= 0 && k <= 3))
  }

  test("q248 session paths: well-formed triples, sorted by support, " +
    "counts bounded by q194's pair supports") {
    val rows = SparkEntry.queries("q248_session_paths")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 10)
    val types = Set("click", "view", "purchase", "signup", "error")
    rows.foreach { case (p, n) =>
      val steps = p.split(">")
      assert(steps.length == 3 && steps.forall(types), s"malformed path $p")
      assert(n > 0)
    }
    rows.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "top-10 must be support-sorted")
      case _ => ()
    }
    // a>b>c occurrences can never exceed the a>b transition count q194
    // reports over the same sessionization
    val pairs = SparkEntry.queries("q194_session_transitions")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { case (p, n) =>
      val s0 = p.split(">")
      val bound = pairs.getOrElse((s0(0), s0(1)), 0L)
      assert(n <= bound,
        s"path $p support $n exceeds its first-transition support $bound")
    }
  }

  test("q255 seasonal indices: ledgers conserve the daily revenue and " +
    "every index replays in BigInt") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q255_seasonal_indices")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val daily = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .collect().map(_.getLong(1))
    val (n, tot) = (daily.length.toLong, daily.sum)
    assert(rows.map(_._2).sum == n && rows.map(_._3).sum == tot,
      "weekday ledgers must partition the day domain and its revenue")
    rows.foreach { case (dow, nd, c, bp) =>
      assert(bp == (BigInt(c) * n * 10000 / (BigInt(nd) * tot)).toLong,
        s"dow $dow index replay mismatch")
    }
  }

  test("q253 cohort matrix: week-0 is definitionally full, cells bounded " +
    "by their cohort, cohorts partition the signup universe") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q253_cohort_matrix")(spark, sfDir)
      .collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (cw, k, act, coh, bp) =>
      assert(k >= 0 && act <= coh,
        s"cohort $cw offset $k: active $act exceeds cohort $coh")
      assert(bp == act * 10000 / coh)
      if (k == 0) assert(bp == 10000L,
        s"cohort $cw: signup week must be fully retained, got $bp bp")
    }
    val signups = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    val cohortSizes = rows.filter(_._2 == 0L).map(r => r._1 -> r._4).toMap
    assert(cohortSizes.values.sum == signups,
      "cohorts must partition the signing-up users")
  }
}
