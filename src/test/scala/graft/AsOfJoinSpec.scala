package graft

import graft.plans.AsOfJoin
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join operator: semantics on hand-built edge cases +
  * equivalence with the composed formulation on the fixtures. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks latest right <= left, null when none") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:10:00"), 102.0),
      (2L, ts("2024-01-01 10:07:00"), 200.0),
      (4L, ts("2024-01-01 09:00:00"), 400.0) // key with no trades
    ).toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:06:00"), "t1"), // → 101.0 (10:05)
      (1L, ts("2024-01-01 10:10:00"), "t2"), // → 102.0 (exact match at 10:10)
      (1L, ts("2024-01-01 09:59:00"), "t3"), // → null (before all quotes)
      (2L, ts("2024-01-01 12:00:00"), "t4"), // → 200.0
      (3L, ts("2024-01-01 10:00:00"), "t5")  // → null (no quotes for key)
    ).toDF("t_key", "t_ts", "trade_id")
    val out = AsOfJoin.asofJoin(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select($"trade_id", $"price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(
      "t1" -> Some(101.0), "t2" -> Some(102.0), "t3" -> None,
      "t4" -> Some(200.0), "t5" -> None))
  }

  test("native operator appears in the physical plan (no join+window)") {
    import spark.implicits._
    val a = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val b = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("k2", "t2", "v")
    val df = AsOfJoin.asofJoin(a, b, "k", "k2", "t", "t2")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(500)) // Exec suffix is stripped in plan strings
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Window"))
  }

  test("native == composed on the fixture events") {
    val composed = SparkEntry.queries("q18_asof_join")(spark, sfDir)
      .collect().map(_.toString).sorted
    val native = SparkEntry.queries("q19_asof_join_native")(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(native.length === composed.length)
    assert(native === composed)
  }

  test("null timestamps never match (either side)") {
    import spark.implicits._
    val left = Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), "l1"),
      (1L, None: Option[Timestamp], "l2")
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, None: Option[Timestamp], 99.0), // null right ts: never a match
      (1L, Some(ts("2024-01-01 09:00:00")), 1.0)
    ).toDF("k2", "t2", "v")
    val out = AsOfJoin.asofJoin(left, right, "k", "k2", "t", "t2")
      .select($"lid", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map("l1" -> Some(1.0), "l2" -> None))
  }

  test("self as-of-join from one DataFrame resolves sides independently") {
    import spark.implicits._
    val base = Seq(
      (1L, ts("2024-01-01 10:00:00"), "early"),
      (1L, ts("2024-01-01 11:00:00"), "late")
    ).toDF("k", "t", "tag")
    val out = AsOfJoin.asofJoin(base, base, "k", "k", "t", "t")
    // four output columns from each side, distinct values
    val rows = out.collect().map(r => (r.getString(2), r.getString(5))).toSet
    // each left row's as-of match is itself (t <= t, latest)
    assert(rows === Set(("early", "early"), ("late", "late")))
  }

  test("equal-(key,time) right rows break ties by the declared tiebreak (max)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "probe")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 7L),
      (1L, ts("2024-01-01 09:30:00"), 3L),
      (1L, ts("2024-01-01 09:30:00"), 9L)
    ).toDF("k2", "t2", "rid")
    val out = AsOfJoin.asofJoin(left, right, "k", "k2", "t", "t2",
      rightTiebreakCol = Some("rid")).select($"rid").collect()
    assert(out.length === 1 && out(0).getLong(0) === 9L)
  }

  test("null join keys never match (SQL equi semantics)") {
    import spark.implicits._
    val left = Seq(
      (Some(1L), ts("2024-01-01 10:00:00"), "l1"),
      (None: Option[Long], ts("2024-01-01 10:00:00"), "l2")
    ).toDF("k", "t", "lid")
    val right = Seq(
      (None: Option[Long], ts("2024-01-01 09:00:00"), 99.0),
      (Some(1L), ts("2024-01-01 09:00:00"), 1.0)
    ).toDF("k2", "t2", "v")
    val out = AsOfJoin.asofJoin(left, right, "k", "k2", "t", "t2")
      .select($"lid", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map("l1" -> Some(1.0), "l2" -> None))
  }

  test("survives empty right side") {
    import spark.implicits._
    val a = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val b = Seq.empty[(Long, Timestamp, Double)].toDF("k2", "t2", "v")
    val rows = AsOfJoin.asofJoin(a, b, "k", "k2", "t", "t2").collect()
    assert(rows.length === 1)
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3))
  }
}
