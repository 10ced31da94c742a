package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join evidence: the runtime re-plan the 100 TB story leans on
  * (README "salting for skew, AQE for runtime re-plan") demonstrated on a
  * planted hot key — a join whose static plan would stall one straggler
  * task with ~60% of the rows gets its skewed partition SPLIT by adaptive
  * execution, visible as skew=true on the final SortMergeJoin. Thresholds
  * are lowered to make the 2M-row local fixture cross the same code path
  * a multi-GB partition crosses in production; restored after.
  */
class AqeSkewSpec extends AnyFunSuite {
  import TestSession._

  test("AQE splits a planted skewed join partition (skew=true), result " +
    "identical to the unsplit join") {
    val c = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      // force the shuffle join the skew optimizer targets (the 100k-row
      // dim would otherwise broadcast — which is ALSO a valid skew fix,
      // but not the one under test)
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // ~60% of 2M rows share key 7 → one ~hot partition far past the
      // lowered threshold; the rest spread over 100k keys
      val big = spark.range(2000000L).select(
        when($"id" % 10 <= 5, 7L).otherwise($"id" % 100000L).as("k"),
        ($"id" * 3).as("payload"))
      val dim = spark.range(100000L).select($"id".as("k"), ($"id" + 1).as("v"))
      val j = big.join(dim, Seq("k"))
      // every big row matches exactly one dim row — the row count is
      // exact and proves the split changed the SCHEDULE, not the
      // result. Materialize through j's OWN QueryExecution (toRdd, not
      // count() which plans a separate execution) so the inspected
      // plan is the one AQE finalized; no aggregate downstream, since
      // a required hash partitioning on k would veto the skew split.
      assert(j.queryExecution.toRdd.count() == 2000000L)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot partition skew=true:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }
}
