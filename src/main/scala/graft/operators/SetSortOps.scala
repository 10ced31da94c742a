package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Set operations + global sort/limit capability surface (SURVEY.md §2B
  * "Set ops" and "Sort/limit/top-k").
  *
  * Scale notes: UNION ALL is a zero-shuffle concat; INTERSECT/EXCEPT
  * compile to aggregate+join on the full row — fine here because both sides
  * are pre-projected to narrow key columns first (project-before-set-op is
  * the pattern that survives scale). Global ORDER BY + LIMIT n compiles to
  * TakeOrderedAndProject: per-partition top-n then a single driver merge of
  * n×partitions rows — no full sort.
  */
object SetSortOps extends QueryModule {

  override def queries: Seq[Q] = Seq(
    Q(
      "q26_union_all",
      "UNION ALL (bag union) of two filtered projections, re-aggregated.",
      (s, dir) => {
        import s.implicits._
        val hi = Tables.t(s, dir, "customer").filter($"c_acctbal" > 8000.0)
          .select($"c_nationkey".as("nationkey"))
        val lo = Tables.t(s, dir, "supplier").filter($"s_acctbal" > 8000.0)
          .select($"s_nationkey".as("nationkey"))
        hi.union(lo)
          .groupBy($"nationkey").agg(count(lit(1)).as("n"))
          .orderBy($"nationkey")
      },
      Some("""
        SELECT nationkey, count(*) AS n
        FROM (SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000.0
              UNION ALL
              SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000.0)
        GROUP BY nationkey
        ORDER BY nationkey""")),

    Q(
      "q27_intersect",
      "INTERSECT (distinct): nations having both a rich customer and a rich " +
        "supplier.",
      (s, dir) => {
        import s.implicits._
        val a = Tables.t(s, dir, "customer").filter($"c_acctbal" > 9000.0)
          .select($"c_nationkey".as("nationkey"))
        val b = Tables.t(s, dir, "supplier").filter($"s_acctbal" > 9000.0)
          .select($"s_nationkey".as("nationkey"))
        a.intersect(b).orderBy($"nationkey")
      },
      Some("""
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
        INTERSECT
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000.0
        ORDER BY nationkey""")),

    Q(
      "q28_except",
      "EXCEPT (distinct): nations with a rich customer but no rich supplier.",
      (s, dir) => {
        import s.implicits._
        val a = Tables.t(s, dir, "customer").filter($"c_acctbal" > 9000.0)
          .select($"c_nationkey".as("nationkey"))
        val b = Tables.t(s, dir, "supplier").filter($"s_acctbal" > 9000.0)
          .select($"s_nationkey".as("nationkey"))
        a.except(b).orderBy($"nationkey")
      },
      Some("""
        SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000.0
        EXCEPT
        SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000.0
        ORDER BY nationkey""")),

    Q(
      "q29_except_all",
      "EXCEPT ALL (bag difference) on orderpriority multisets of two date " +
        "ranges, re-counted.",
      (s, dir) => {
        import s.implicits._
        val a = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" < lit("1996-01-01 00:00:00").cast("timestamp"))
          .select($"o_orderpriority")
        val b = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("2001-01-01 00:00:00").cast("timestamp"))
          .select($"o_orderpriority")
        a.exceptAll(b)
          .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n
        FROM ((SELECT o_orderpriority FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01')
              EXCEPT ALL
              (SELECT o_orderpriority FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'))
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    Q(
      "q30_sort_limit",
      "Global ORDER BY … LIMIT (top 20 orders by price; unique-key " +
        "tiebreak). Compiles to TakeOrderedAndProject, not a full sort.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(20)
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20""")),

    Q(
      "q31_multi_col_sort",
      "Multi-column mixed-direction global sort with NULLS handling made " +
        "explicit on both sides.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "supplier")
          .select($"s_nationkey", $"s_acctbal", $"s_suppkey")
          .orderBy($"s_nationkey".asc, $"s_acctbal".desc_nulls_last, $"s_suppkey".asc)
      },
      Some("""
        SELECT s_nationkey, s_acctbal, s_suppkey
        FROM supplier
        ORDER BY s_nationkey ASC, s_acctbal DESC NULLS LAST, s_suppkey ASC"""))
  )
}
