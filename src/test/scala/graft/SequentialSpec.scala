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
}
