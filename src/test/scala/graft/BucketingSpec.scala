package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketing — the co-location strategy for repeated fact-fact joins at
  * scale: both tables pre-bucketed on the join key join WITHOUT any
  * Exchange (at 100 TB that shuffle is the dominant cost; bucketed layout
  * pays it once at write time instead of per query).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed fact-fact join runs with zero exchanges") {
    // warehouse dir is a temp dir set at session build (TestSession)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.t(spark, sfDir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      Tables.t(spark, sfDir, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
        .groupBy("o_orderpriority").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(plan.contains("SelectedBucketsCount"), "scans should be bucket-aware")
      // the join itself must not shuffle either side; the only exchange
      // allowed is the one feeding the final small aggregation
      val joinSection = plan.substring(0, plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed join sides must not re-shuffle")

      // correctness unchanged vs the unbucketed join
      val unbucketed = Tables.t(spark, sfDir, "lineitem")
        .join(Tables.t(spark, sfDir, "orders"),
          Tables.t(spark, sfDir, "lineitem")("l_orderkey") ===
            Tables.t(spark, sfDir, "orders")("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val bucketed = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(bucketed === unbucketed)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.sql("DROP TABLE IF EXISTS orders_b")
    }
  }
}
