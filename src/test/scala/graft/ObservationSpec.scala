package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Observation / CollectMetrics surface (SURVEY §2B monitoring):
  * production pipelines need row counts, sums and bounds of what a job
  * actually processed — and `df.observe` delivers them ON the action's
  * own scan, where a naive metrics pass would re-read the table (the
  * q288-class 2x-scan mistake, at every job, forever). These tests pin
  * (a) metric values equal an independent recompute, (b) metrics
  * observe the stage they are ATTACHED to, not the post-filter result,
  * and (c) the observed action costs exactly one file scan.
  */
class ObservationSpec extends AnyFunSuite {
  import TestSession._

  test("observed ingest metrics match a direct recompute") {
    val obs = Observation("ingest_metrics")
    val df = Tables.t(spark, sfDir, "lineitem")
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(expr("cast(l_quantity as bigint)")).as("qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .filter(col("l_quantity") > 25)
    val kept = df.count()
    val m = obs.get
    val direct = Tables.t(spark, sfDir, "lineitem")
      .agg(count(lit(1)), sum(expr("cast(l_quantity as bigint)")),
        min(col("l_shipdate")), max(col("l_shipdate"))).head()
    assert(m("rows") == direct.getLong(0))
    assert(m("qty") == direct.getLong(1))
    assert(m("first_ship") == direct.get(2) && m("last_ship") == direct.get(3))
    // the metrics saw the PRE-filter stream — that is the contract that
    // makes observe() an ingest audit rather than a result summary
    assert(kept < direct.getLong(0),
      "fixture must actually filter something for this test to bite")
  }

  test("the observed action costs one scan — no hidden metrics pass") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val obs = Observation("one_scan")
    val df = Tables.t(spark, sfDir, "orders")
      .observe(obs, count(lit(1)).as("rows"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    df.collect()
    def leaves(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case q: QueryStageExec => leaves(q.plan)
      case other if other.children.isEmpty => Seq(other)
      case other => other.children.flatMap(leaves)
    }
    val scans = leaves(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[FileSourceScanExec])
    assert(scans == 1, s"observe() must piggyback on the job's scan, found $scans")
    assert(obs.get("rows").asInstanceOf[Long] > 0)
  }
}
