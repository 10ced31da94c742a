package graft

import org.scalatest.funsuite.AnyFunSuite

/** Statistics-driven planning evidence: "let Catalyst optimize" needs
  * statistics to optimize WITH. A dimension sized above the (scaled)
  * broadcast threshold joined after a 1%-selective filter plans as
  * a sort-merge join without column stats — Spark cannot see through
  * the filter — and flips to a broadcast hash join once ANALYZE TABLE
  * ... FOR ALL COLUMNS gives the CBO the grp ndv to estimate the
  * filter's output at ~2k rows. The static plans are compared (not AQE
  * runtime re-plans — those need the shuffle to already have happened;
  * CBO moves the decision to COMPILE time, which at 100 TB is the
  * difference between never shuffling the fact table and shuffling it
  * once before the runtime notices).
  */
class CboStatsSpec extends AnyFunSuite {
  import TestSession._

  test("ANALYZE column stats flip the filtered-dim join from sort-merge " +
    "to broadcast under CBO") {
    val c = spark.conf
    val keys = Seq("spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k))
    val loc = graft.TempRoots.freshForDir("graft_cbo_dim", sfDir).toString
    try {
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      // ~200k rows with an incompressible md5 pad → parquet well past
      // the 10 MB autoBroadcast threshold, so size-only stats can never
      // justify broadcasting the unfiltered table
      spark.sql(
        s"""CREATE TABLE cbo_dim USING parquet LOCATION '$loc' AS
            SELECT id AS k, CAST(id % 100 AS INT) AS grp,
                   concat(md5(CAST(id AS STRING)),
                          md5(CAST(id + 1 AS STRING)),
                          md5(CAST(id + 2 AS STRING))) AS pad
            FROM range(200000)""")
      // a fact side whose plan-stat size (~48 MB from range stats) rules
      // out broadcasting IT — the decision under test is the dim side
      val fact = spark.range(3000000L)
        .selectExpr("id % 200000 AS k", "id AS price")
      c.set("spark.sql.cbo.enabled", "true")
      // scaled-down decision boundary: the ~10 MB dim sits ABOVE it
      // unfiltered, the ~1%-selective filter estimate lands far below —
      // same flip a 10 GB dim crosses at the default 10 MB threshold
      c.set("spark.sql.autoBroadcastJoinThreshold", "1m")
      def planned: String = fact
        .join(spark.table("cbo_dim").where("grp = 1"), Seq("k"))
        .queryExecution.sparkPlan.toString
      val before = planned
      assert(before.contains("SortMergeJoin") &&
        !before.contains("BroadcastHashJoin"),
        s"without column stats the 25 MB dim must not broadcast:\n" +
          before.take(800))
      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")
      val after = planned
      assert(after.contains("BroadcastHashJoin"),
        s"with grp stats the ~2k-row filtered dim must broadcast:\n" +
          after.take(800))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cbo_dim")
      saved.foreach {
        case (k, Some(v)) => c.set(k, v)
        case (k, None) => c.unset(k)
      }
    }
  }
}
