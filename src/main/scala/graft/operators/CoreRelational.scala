package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core scan / filter / projection / aggregation capability surface
  * (SURVEY.md §2B "Projection/filter" + "Aggregation" rows).
  *
  * The reference delegates all of this to MySQL (SURVEY §2A: the only SQL it
  * emits is DDL + INSERT, main.go:189-195); here each capability is a
  * declarative DataFrame plan so Catalyst provides pushdown, partial
  * aggregation and whole-stage codegen.
  *
  * Scale notes (100 TB): every query below is a single scan→(partial agg)→
  * shuffle-on-group-keys→final agg pipeline. Group-key cardinality is tiny
  * relative to input, so map-side combine collapses the shuffle; filters and
  * column pruning reach the parquet reader (verified via .explain in
  * PlanSpec).
  */
object CoreRelational extends QueryModule {

  override def queries: Seq[Q] = Seq(
    Q(
      "q01_pricing_summary",
      "TPC-H Q1-style wide aggregate: filter→groupBy→8 aggregates. " +
        "Partial agg (map-side combine) makes the shuffle carry only " +
        "|returnflag×linestatus| rows per task.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
            round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"),
            round(avg($"l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                        AS sum_qty,
               round(sum(l_extendedprice), 2)                                   AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
               round(avg(l_quantity), 4)                                        AS avg_qty,
               round(avg(l_extendedprice), 4)                                   AS avg_price,
               round(avg(l_discount), 4)                                        AS avg_disc,
               count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    Q(
      "q02_filter_project",
      "Predicate + projection pushdown: both the shipdate/quantity filters " +
        "and the 4-column ReadSchema must reach the parquet scan.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .filter(
            $"l_shipdate" >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            $"l_shipdate" < lit("1997-07-01 00:00:00").cast("timestamp") &&
            $"l_quantity" < 10.0)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
          AND l_quantity < 10.0
        ORDER BY l_orderkey, l_linenumber""")),

    Q(
      "q03_agg_distinct",
      "Distinct aggregates: COUNT(DISTINCT) + SUM(DISTINCT) alongside plain " +
        "aggregates (Catalyst expands to a two-phase distinct-agg plan).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            countDistinct($"o_custkey").as("n_customers"),
            count(lit(1)).as("n_orders"),
            round(sum($"o_totalprice"), 2).as("sum_price"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey)    AS n_customers,
               count(*)                     AS n_orders,
               round(sum(o_totalprice), 2)  AS sum_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    Q(
      "q04_approx_distinct",
      "HyperLogLog++ approximate distinct (approx_count_distinct). No SQL " +
        "oracle: DuckDB's approx_count_distinct uses a different sketch, so " +
        "the driver records a rows-only check; exactness is covered by " +
        "q03_agg_distinct.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_partkey").as("approx_parts"),
            approx_count_distinct($"l_orderkey").as("approx_orders"))
          .orderBy($"l_returnflag")
      },
      None),

    Q(
      "q113_approx_percentile",
      "Mergeable quantile sketch (approx_percentile / GK summaries): " +
        "p50/p95 price per returnflag in ONE pass with bounded state — " +
        "the 100 TB form of order statistics (exact q44 needs a sort or " +
        "full value materialization per group; the sketch shuffles O(1/ε) " +
        "summaries and merges associatively). No SQL oracle: DuckDB's " +
        "approx_quantile uses t-digest, a different sketch; the error " +
        "bound vs exact percentile_cont is asserted in QueryCorpusSpec.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("p50"),
            percentile_approx($"l_extendedprice", lit(0.95), lit(10000)).as("p95"))
          .orderBy($"l_returnflag")
      },
      None),

    Q(
      "q05_rollup",
      "ROLLUP hierarchy totals (returnflag → linestatus → grand total).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
          .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q(
      "q06_cube",
      "CUBE over orderstatus × orderpriority (all 4 grouping sets).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), round(avg($"o_totalprice"), 4).as("avg_price"))
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    Q(
      "q07_grouping_sets",
      "Explicit GROUPING SETS ((flag), (status), ()) via SQL.",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    Q(
      "q08_distinct_rows",
      "Row-level DISTINCT (dropDuplicates ≡ groupBy-all-cols).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .select($"o_orderstatus", $"o_orderpriority")
          .distinct()
          .orderBy($"o_orderstatus", $"o_orderpriority")
      },
      Some("""
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders
        ORDER BY o_orderstatus, o_orderpriority""")),

    Q(
      "q09_conditional_agg",
      "CASE WHEN / NULLIF / COALESCE expression surface feeding an aggregate.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .select(
            when($"o_totalprice" > 300000.0, "big")
              .when($"o_totalprice" > 150000.0, "mid")
              .otherwise("small").as("bucket"),
            coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status_label"),
            $"o_totalprice")
          .groupBy($"bucket", $"status_label")
          .agg(count(lit(1)).as("n"), round(max($"o_totalprice"), 2).as("max_price"))
          .orderBy($"bucket", $"status_label")
      },
      Some("""
        SELECT CASE WHEN o_totalprice > 300000.0 THEN 'big'
                    WHEN o_totalprice > 150000.0 THEN 'mid'
                    ELSE 'small' END                              AS bucket,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN')       AS status_label,
               count(*)                                           AS n,
               round(max(o_totalprice), 2)                        AS max_price
        FROM orders
        GROUP BY 1, 2
        ORDER BY bucket, status_label""")),

    Q(
      "q154_table_stats",
      "TABLE PROFILING (the ANALYZE-equivalent a cost-based optimizer " +
        "and a data-quality monitor both consume): per-column row count, " +
        "null count, exact distinct count, and min/max (rendered as " +
        "strings so heterogeneous column types share one result schema; " +
        "numeric min/max computed on the TYPED value, cast after — " +
        "floating columns hop through DECIMAL(30,6) first, because the " +
        "engines' default double-to-string rules diverge at |v|>=1e7: " +
        "Java flips to scientific notation, DuckDB never does; the " +
        "fixed-scale decimal rendering '12345.670000' is identical on " +
        "both at any magnitude). One " +
        "aggregate pass per column over a pruned single-column scan — at " +
        "100 TB swap the exact countDistinct for approx_count_distinct " +
        "(q04's HLL) and the per-column passes collapse into one " +
        "multi-aggregate scan; exact ndv here is what makes the row " +
        "SQL-oracle-able.",
      (s, dir) => {
        import org.apache.spark.sql.DataFrame
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
        def stats(col: String): DataFrame = {
          val floating = o.schema(col).dataType match {
            case org.apache.spark.sql.types.DoubleType |
                 org.apache.spark.sql.types.FloatType => true
            case _ => false
          }
          def render(c: Column) =
            if (floating) c.cast("decimal(30,6)").cast("string")
            else c.cast("string")
          o.agg(
            lit(col).as("column_name"),
            count(lit(1)).as("n_rows"),
            sum(when(o(col).isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(o(col)).as("ndv"),
            render(min(o(col))).as("min_str"),
            render(max(o(col))).as("max_str"))
        }
        Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
          .map(stats).reduce(_ unionByName _)
          .orderBy($"column_name")
      },
      Some("""
        SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               count(DISTINCT o_orderkey) AS ndv,
               CAST(min(o_orderkey) AS VARCHAR) AS min_str,
               CAST(max(o_orderkey) AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*),
               CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderstatus),
               CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*),
               CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_totalprice),
               CAST(CAST(min(o_totalprice) AS DECIMAL(30,6)) AS VARCHAR),
               CAST(CAST(max(o_totalprice) AS DECIMAL(30,6)) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT o_orderpriority),
               CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
        FROM orders
        ORDER BY column_name""")),

    Q(
      "q157_histogram",
      "EQUI-WIDTH HISTOGRAM of event values (8 buckets of 50 over " +
        "[0, 400), top bucket clamps the tail): bucket index is pure " +
        "integer-from-floor arithmetic — floor(v/50) is " +
        "IEEE-deterministic on both engines, unlike percentile-based " +
        "equi-depth cuts. One map-side projection + one tiny-domain " +
        "aggregate; the shuffle carries at most 8 keys per task. The " +
        "distribution profile q154's min/max can't show, and the " +
        "histogram a CBO's selectivity estimator consumes.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .select(least(floor($"value" / 50.0), lit(7.0)).cast("int").as("bucket"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"))
          .select($"bucket",
            ($"bucket" * 50).cast("double").as("lo"),
            when($"bucket" === 7, lit(Double.PositiveInfinity))
              .otherwise(($"bucket" * 50 + 50).cast("double")).as("hi"),
            $"n")
          .orderBy($"bucket")
      },
      Some("""
        WITH b AS (SELECT CAST(least(floor(value / 50.0), 7.0) AS INTEGER) AS bucket
                   FROM events)
        SELECT bucket,
               CAST(bucket * 50 AS DOUBLE) AS lo,
               CASE WHEN bucket = 7 THEN CAST('inf' AS DOUBLE)
                    ELSE CAST(bucket * 50 + 50 AS DOUBLE) END AS hi,
               count(*) AS n
        FROM b GROUP BY bucket
        ORDER BY bucket""")),

    Q(
      "q168_exact_percentiles",
      "EXACT distributional percentiles (p50/p90/p99 of l_quantity per " +
        "return flag) via COUNTING-SORT inverse CDF — the exact, " +
        "oracle-able complement to q113's HLL-family approx sketch: " +
        "per-value counts (the shuffle carries the <=50-value domain " +
        "with map-side combine, never rows), a per-flag cumulative sum " +
        "over that bounded domain, then v_p = min v with 100*cum >= " +
        "pct*n — CROSS-MULTIPLIED INTEGER arithmetic (q136's trick " +
        "applied to quantiles), because ceil(0.9*n) in doubles is a " +
        "genuine cross-engine ULP hazard while 10*cum >= 9*n is not. " +
        "Exactly the shape that scales: percentile-of-bounded-domain is " +
        "a counting sort, not a global sort.",
      (s, dir) => {
        import s.implicits._
        val counts = Tables.t(s, dir, "lineitem")
          .select($"l_returnflag".as("flag"), $"l_quantity".cast("int").as("v"))
          .groupBy($"flag", $"v").agg(count(lit(1)).as("c"))
        val wCum = Window.partitionBy($"flag").orderBy($"v")
        val cum = counts.withColumn("cum", sum($"c").over(wCum))
        val tot = counts.groupBy($"flag").agg(sum($"c").as("n"))
        val ps = Seq(("p50", 50), ("p90", 90), ("p99", 99)).toDF("lbl", "pct")
        cum.join(broadcast(tot), Seq("flag"))
          .crossJoin(broadcast(ps))
          .filter($"cum" * 100 >= $"pct" * $"n")
          .groupBy($"flag", $"lbl")
          .agg(min($"v").as("value"))
          .orderBy($"flag", $"lbl")
      },
      Some("""
        WITH q AS (SELECT l_returnflag AS flag, CAST(l_quantity AS INTEGER) AS v
                   FROM lineitem),
        c AS (SELECT flag, v, count(*) AS c FROM q GROUP BY 1, 2),
        cum AS (SELECT flag, v, c,
                       sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum
                FROM c),
        t AS (SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY flag),
        p(lbl, pct) AS (VALUES ('p50', 50), ('p90', 90), ('p99', 99))
        SELECT cum.flag, p.lbl, CAST(min(v) AS INTEGER) AS value
        FROM cum JOIN t USING (flag) CROSS JOIN p
        WHERE cum * 100 >= p.pct * t.n
        GROUP BY cum.flag, p.lbl
        ORDER BY flag, lbl""")),

    Q(
      "q372_hll_error_audit",
      "HLL ACCURACY AUDIT — q04 uses approx_count_distinct and trusts " +
        "the rsd contract; this MEASURES it (the q334/q371 " +
        "measured-not-assumed discipline applied to sketches): three " +
        "cardinality probes (order custkeys, lineitem partkeys, " +
        "lineitem orderkeys) each estimated at rsd 0.05 and 0.01 " +
        "beside the exact distinct, absolute error in ppm of truth. " +
        "Rows-only: the estimate is the engine's HLL++ register " +
        "state, definitionally engine-specific; the spec pins each " +
        "error within 5x its configured rsd (a ~5-sigma bound). " +
        "100 TB: the whole point of the sketch — per-probe memory is " +
        "O(registers) while exact distinct shuffles the key domain; " +
        "the audit quantifies what that saving costs in accuracy.",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
        val li = Tables.t(s, dir, "lineitem")
        def probe(name: String, df: org.apache.spark.sql.DataFrame,
            c: String) = {
          val r = df.agg(
            countDistinct(col(c)).as("exact"),
            approx_count_distinct(col(c), 0.05).as("a5"),
            approx_count_distinct(col(c), 0.01).as("a1"))
          r.select(lit(name).as("probe"), lit(50000L).as("rsd_ppm"),
              $"exact", $"a5".as("approx"))
            .unionAll(r.select(lit(name), lit(10000L), $"exact",
              $"a1"))
        }
        probe("orders.o_custkey", o, "o_custkey")
          .unionAll(probe("lineitem.l_partkey", li, "l_partkey"))
          .unionAll(probe("lineitem.l_orderkey", li, "l_orderkey"))
          .select($"probe", $"rsd_ppm", $"exact", $"approx",
            expr("abs(approx - exact) * 1000000 div exact")
              .as("abs_err_ppm"))
          .orderBy($"probe", $"rsd_ppm")
      },
      None),

    Q(
      "q377_percentile_interpolated",
      "LINEARLY-INTERPOLATED PERCENTILES, EXACT (percentile_cont / " +
        "numpy type-7 semantics — q168 takes the nearest-rank value; " +
        "this completes the percentile surface with the interpolating " +
        "definition analysts actually get from pandas): at 0-indexed " +
        "position p*(N-1)/100, result = lo*(100-rem) + hi*rem in " +
        "deci-milli-cents, where ipos/rem are the exact integer " +
        "quotient/remainder of p*(N-1) by 100 — NO floating " +
        "interpolation anywhere, so the oracle is bit-exact where " +
        "engine quantile_cont floats would drift. Rank lookups are " +
        "counting-CDF mins over the cents DOMAIN (never a row sort): " +
        "value_at(k) = min(v: cum(v) >= k+1), one bounded >= join " +
        "per rank. 100 TB: one domain aggregate + two broadcast " +
        "theta-joins of a 4-row percentile frame.",
      (s, dir) => {
        import s.implicits._
        val dom = Tables.t(s, dir, "orders")
          .select(expr("cast(round(o_totalprice * 100) as bigint)")
            .as("v"))
          .groupBy($"v").agg(count(lit(1)).as("cnt"))
        val wCum = Window.orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = dom.withColumn("cum", sum($"cnt").over(wCum))
        val n = broadcast(dom.agg(sum($"cnt").as("n")))
        val pcts = broadcast(Seq(25L, 50L, 75L, 90L).toDF("pct")
          .crossJoin(n)
          .withColumn("ipos", expr("pct * (n - 1) div 100"))
          .withColumn("rem", expr("pct * (n - 1) % 100")))
        val lo = cum.join(pcts, $"cum" >= $"ipos" + 1)
          .groupBy($"pct").agg(min($"v").as("lo"))
        val hi = cum.join(pcts, $"cum" >= $"ipos" + 2)
          .groupBy($"pct").agg(min($"v").as("hi"))
        pcts.join(lo, Seq("pct")).join(hi, Seq("pct"), "left")
          .select($"pct", $"n", $"lo", coalesce($"hi", $"lo").as("hi"),
            $"rem",
            (($"lo" * (lit(100L) - $"rem") +
              coalesce($"hi", $"lo") * $"rem"))
              .as("interp_decimilli_cents"))
          .orderBy($"pct")
      },
      Some("""
        WITH dom AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM orders GROUP BY 1),
        cum AS (
          SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM dom),
        nt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM dom),
        pcts AS (
          SELECT pct, n, pct * (n - 1) // 100 AS ipos,
                 pct * (n - 1) % 100 AS rem
          FROM (VALUES (25), (50), (75), (90)) p(pct) CROSS JOIN nt),
        lo AS (
          SELECT pct, min(v) AS lo FROM cum JOIN pcts
            ON cum.cum >= pcts.ipos + 1 GROUP BY pct),
        hi AS (
          SELECT pct, min(v) AS hi FROM cum JOIN pcts
            ON cum.cum >= pcts.ipos + 2 GROUP BY pct)
        SELECT CAST(pcts.pct AS BIGINT) AS pct, n,
               CAST(lo.lo AS BIGINT) AS lo,
               CAST(coalesce(hi.hi, lo.lo) AS BIGINT) AS hi,
               CAST(rem AS BIGINT) AS rem,
               CAST(lo.lo * (100 - rem) + coalesce(hi.hi, lo.lo) * rem
                 AS BIGINT) AS interp_decimilli_cents
        FROM pcts JOIN lo ON pcts.pct = lo.pct
        LEFT JOIN hi ON pcts.pct = hi.pct
        ORDER BY pct""")),

    Q(
      "q399_kmv_sketch_algebra",
      "KMV (K-MINIMUM-VALUES) DISTINCT SKETCH WITH SET ALGEBRA " +
        "(Bar-Yossef et al. 2002; the theta-sketch family's exact-" +
        "arithmetic core): keep the k=64 smallest DISTINCT hash " +
        "values of a set; estimate |S| = (k-1)*M div h_(k) (exact " +
        "count when fewer than k hashes exist). Unlike the HLL " +
        "rows (q04/q152/q372), KMV signatures support UNION by " +
        "merging signatures (k smallest of the concatenation) and " +
        "INTERSECTION by inclusion-exclusion — the sketch algebra a " +
        "multi-tenant platform uses to answer 'how many users did " +
        "BOTH' from per-set kilobyte sketches without rescanning. " +
        "The hash is the engine-portable Knuth mixer (q361's " +
        "discipline, modulus 2^31-1), so every estimate — not just " +
        "the exact legs — is bit-reproducible in DuckDB: clicker " +
        "users, purchaser users, their union and their intersection, " +
        "each with the exact truth and signed bias ppm beside it. " +
        "Plan: one (type, user) distinct, per-set bounded top-k " +
        "windows (k rows per set, partitioned by set), O(k) algebra " +
        "after. 100 TB: the signatures are 64 longs per set forever.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val k = 64
        val tu = Tables.t(s, dir, "events")
          .filter($"event_type".isin("click", "purchase"))
          .select($"event_type".as("t"), $"user_id").distinct()
        val hs = tu.select($"t",
            (($"user_id" * 2654435761L + 987654321L) % 2147483647L)
              .as("h"))
          .distinct()
        val sigs = hs
          .withColumn("rk", row_number().over(
            Window.partitionBy($"t").orderBy($"h")))
          .filter($"rk" <= k)
        val uSig = sigs.select($"h").distinct()
          .withColumn("rk", row_number().over(
            Window.partitionBy(lit(1)).orderBy($"h")))
          .filter($"rk" <= k)
          .select(lit("union").as("t"), $"h", $"rk")
        def est(sig: org.apache.spark.sql.DataFrame) = sig
          .groupBy($"t")
          .agg(count(lit(1)).as("n_sig"), max($"h").as("kth"))
          .select($"t", $"n_sig",
            when($"n_sig" < k, $"n_sig")
              .otherwise(expr(s"${k - 1}L * 2147483647L div kth"))
              .as("est"))
        val ests = est(sigs).unionByName(est(uSig))
        val exA = tu.filter($"t" === "click")
          .agg(count(lit(1)).as("x")).head().getLong(0)
        val exB = tu.filter($"t" === "purchase")
          .agg(count(lit(1)).as("x")).head().getLong(0)
        val exU = tu.select($"user_id").distinct().count()
        val e = ests.collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        val inter = e("click")._2 + e("purchase")._2 - e("union")._2
        val rows = Seq(
          ("click", e("click")._1, e("click")._2, exA),
          ("intersection", 0L, inter, exA + exB - exU),
          ("purchase", e("purchase")._1, e("purchase")._2, exB),
          ("union", e("union")._1, e("union")._2, exU))
        rows.toDF("set_name", "n_sig", "est", "exact")
          .withColumn("bias_ppm",
            expr("(est - exact) * 1000000 div nullif(exact, 0)"))
          .orderBy($"set_name")
      },
      Some("""
        WITH tu AS (
          SELECT DISTINCT event_type AS t, user_id
          FROM events WHERE event_type IN ('click', 'purchase')),
        hs AS (
          SELECT DISTINCT t,
                 (user_id * 2654435761 + 987654321) % 2147483647 AS h
          FROM tu),
        sigs AS (
          SELECT t, h FROM (
            SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h)
              AS rk FROM hs)
          WHERE rk <= 64),
        usig AS (
          SELECT h FROM (
            SELECT h, row_number() OVER (ORDER BY h) AS rk
            FROM (SELECT DISTINCT h FROM sigs))
          WHERE rk <= 64),
        e AS (
          SELECT t, CAST(count(*) AS BIGINT) AS n_sig,
                 CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
                      ELSE CAST(CAST(63 AS BIGINT) * 2147483647 // max(h) AS BIGINT)
                 END AS est
          FROM sigs GROUP BY t
          UNION ALL
          SELECT 'union', CAST(count(*) AS BIGINT),
                 CASE WHEN count(*) < 64 THEN CAST(count(*) AS BIGINT)
                      ELSE CAST(CAST(63 AS BIGINT) * 2147483647 // max(h) AS BIGINT)
                 END
          FROM usig),
        ex AS (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM tu
                  WHERE t = 'click') AS ex_a,
                 (SELECT CAST(count(*) AS BIGINT) FROM tu
                  WHERE t = 'purchase') AS ex_b,
                 (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                  FROM tu) AS ex_u),
        rows_ AS (
          SELECT 'click' AS set_name,
                 (SELECT n_sig FROM e WHERE t = 'click') AS n_sig,
                 (SELECT est FROM e WHERE t = 'click') AS est,
                 ex_a AS exact FROM ex
          UNION ALL
          SELECT 'intersection', 0,
                 (SELECT est FROM e WHERE t = 'click')
                   + (SELECT est FROM e WHERE t = 'purchase')
                   - (SELECT est FROM e WHERE t = 'union'),
                 ex_a + ex_b - ex_u FROM ex
          UNION ALL
          SELECT 'purchase',
                 (SELECT n_sig FROM e WHERE t = 'purchase'),
                 (SELECT est FROM e WHERE t = 'purchase'), ex_b FROM ex
          UNION ALL
          SELECT 'union', (SELECT n_sig FROM e WHERE t = 'union'),
                 (SELECT est FROM e WHERE t = 'union'), ex_u FROM ex)
        SELECT set_name, CAST(n_sig AS BIGINT) AS n_sig,
               CAST(est AS BIGINT) AS est, exact,
               CAST((est - exact) * 1000000 // nullif(exact, 0)
                 AS BIGINT) AS bias_ppm
        FROM rows_ ORDER BY set_name""")),

    Q(
      "q410_kll_quantile_sketch",
      "KLL QUANTILE SKETCH WITH A SELF-TRACKED ERROR CERTIFICATE " +
        "(Karnin-Lang-Liberty 2016's compactor ladder, fully " +
        "deterministic — parity-alternating compaction, no RNG — as a " +
        "native TypedImperativeAggregate, catalyst/QuantileSketchAgg: " +
        "the missing member of the sketch family: bounded-memory " +
        "MERGEABLE quantiles, where q113's built-in Greenwald-Khanna " +
        "is not mergeable across arbitrary partials and q168/q377 are " +
        "exact but domain-scale): the order-value sketch (k=1024, a " +
        "few KB) is built in ONE map-side-combined pass, seven " +
        "percentile probes are answered from the blob on the driver, " +
        "and each answer's TRUE rank interval (one conditional-sum " +
        "pass computes R<= and R< of every estimate — tie-aware, a " +
        "repeated value occupies a rank SPAN) is checked against the " +
        "certificate the sketch carried through every compaction: " +
        "R<=(est) >= target - errBound and R<(est) <= target + " +
        "errBound - 1, where errBound = sum of " +
        "2^level per performed compaction — an exact worst-case " +
        "bound, not a probabilistic one. The ESTIMATE depends on the " +
        "partial-merge tree (not contractual in Spark), so the " +
        "driver-facing row is the CERTIFICATE CHECK (stable under any " +
        "shape — also why no SQL oracle can exist: DuckDB cannot " +
        "replay Spark's merge tree; KernelPropertySpec pins the bound " +
        "under 1/4/32-way splits and adversarial merge trees) beside " +
        "the deterministic exact percentile value from the counting-" +
        "CDF. 100 TB: sketch state is O(k log(n/k)) longs per group " +
        "forever; the wire carries kilobyte sketches, never values — " +
        "q218's incremental-rollup shape for latency ladders.",
      (s, dir) => {
        import s.implicits._
        import graft.catalyst.QuantileSketch
        val v = Tables.t(s, dir, "orders")
          .select(expr("cast(round(o_totalprice * 100) as bigint)")
            .as("v"))
        val blob = v.agg(QuantileSketch
            .kll_sketch_agg($"v", 1024).as("sk"))
          .head().getAs[Array[Byte]](0)
        val sk = QuantileSketch.deserialize(blob)
        val e = sk.errBound
        // theory ceiling: errBound <= 2 n L / k with L levels; the flag
        // is stable under every merge shape while errBound itself isn't
        val lTheory = 64 - java.lang.Long.numberOfLeadingZeros(
          math.max(1L, sk.n / 1024)) + 2
        val certLeTheory = e <= 2L * sk.n * lTheory / 1024 + 1L
        val probes = Seq(1L, 10L, 25L, 50L, 75L, 90L, 99L).map { p =>
          val t = math.max(1L, p * sk.n / 100L)
          (p, t, sk.quantileAtRank(t))
        }
        val pf = probes.toDF("pct", "target_rank", "est")
        // ONE conditional-sum pass grades all seven estimates; the
        // tie-aware guarantee needs both R<=(est) and R<(est): the
        // returned value occupies a rank interval, and the certificate
        // says that interval comes within errBound of the target
        val ranks = v.agg(
          count(lit(1)).as("n"),
          probes.flatMap { case (p, _, est) => Seq(
            sum(($"v" <= est).cast("long")).as(s"le$p"),
            sum(($"v" < est).cast("long")).as(s"lt$p")) }: _*)
        val wCum = Window.orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = v.groupBy($"v").agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum($"cnt").over(wCum))
        val exact = pf.join(cum, $"cum" >= $"target_rank")
          .groupBy($"pct").agg(min($"v").as("exact_value_cents"))
        pf.crossJoin(broadcast(ranks))
          .withColumn("r_le",
            probes.foldLeft(lit(0L)) { case (acc, (p, _, _)) =>
              when($"pct" === p, col(s"le$p")).otherwise(acc) })
          .withColumn("r_lt",
            probes.foldLeft(lit(0L)) { case (acc, (p, _, _)) =>
              when($"pct" === p, col(s"lt$p")).otherwise(acc) })
          .join(broadcast(exact), Seq("pct"))
          .select($"pct", $"n", $"target_rank", $"exact_value_cents",
            ($"r_le" >= $"target_rank" - e &&
              $"r_lt" <= $"target_rank" + e - 1L).cast("long")
              .as("within_certificate"),
            lit(if (certLeTheory) 1L else 0L).as("cert_le_theory"))
          .orderBy($"pct")
      },
      None),

    Q(
      "q411_kll_day_week_rollup",
      "INCREMENTAL QUANTILE ROLLUP FROM PERSISTED DAY SKETCHES — the " +
        "operational reason mergeable quantiles exist (q218's " +
        "day-sketch shape applied to percentiles): per-day KLL " +
        "sketches of event value (k=256, built in one map-side pass) " +
        "roll up to per-week sketches by BLOB MERGE (kll_merge_agg — " +
        "the week stage touches kilobytes of sketch state, never the " +
        "values it summarizes; tomorrow's week only re-merges 7 " +
        "blobs), and every weekly p50/p90/p99 answer is graded " +
        "against its week's exact rank interval under the certificate " +
        "the blobs carried through build AND merge (merged errBound = " +
        "sum of input certificates + merge compactions — still an " +
        "exact worst-case bound). Output is merge-shape-stable like " +
        "q410: the certificate check and the deterministic exact " +
        "value, not the shape-dependent estimate (hence rows-only; " +
        "KernelPropertySpec owns the kernel bound). Weeks are " +
        "engine-portable epoch-day div 7 (q383's rule). 100 TB: the " +
        "day grain is the only row-scale aggregate; rollups and " +
        "probes run on the bounded (week, pct) domain.",
      (s, dir) => {
        import s.implicits._
        import graft.catalyst.QuantileSketch
        val ev = Tables.t(s, dir, "events")
          .select(expr("cast(datediff(to_date(ts), date'1970-01-01') " +
              "as bigint) div 7").as("wk"),
            to_date($"ts").as("d"),
            expr("cast(round(value * 1000000) as bigint)").as("vm"))
        val day = ev.groupBy($"wk", $"d")
          .agg(QuantileSketch.kll_sketch_agg($"vm", 256).as("sk"))
        val week = day.groupBy($"wk")
          .agg(count(lit(1)).as("n_days"),
            QuantileSketch.kll_merge_agg($"sk").as("sk"))
          .collect()
        val probes = Seq(50L, 90L, 99L)
        val graded = week.flatMap { r =>
          val wk = r.getLong(0)
          val nDays = r.getLong(1)
          val sk = QuantileSketch.deserialize(r.getAs[Array[Byte]](2))
          probes.map { p =>
            val t = math.max(1L, p * sk.n / 100L)
            (wk, nDays, p, t, sk.quantileAtRank(t), sk.errBound)
          }
        }.toSeq
        val pf = graded
          .toDF("wk", "n_days", "pct", "target_rank", "est", "err_bound")
        // one pass grades every (week, probe) estimate tie-aware
        val ranks = ev.join(broadcast(pf), Seq("wk"))
          .groupBy($"wk", $"pct")
          .agg(count(lit(1)).as("n_week"),
            sum(($"vm" <= $"est").cast("long")).as("r_le"),
            sum(($"vm" < $"est").cast("long")).as("r_lt"))
        val wCum = Window.partitionBy($"wk").orderBy($"vm")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = ev.groupBy($"wk", $"vm").agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum($"cnt").over(wCum))
        val exact = pf.join(cum, Seq("wk"))
          .filter($"cum" >= $"target_rank")
          .groupBy($"wk", $"pct")
          .agg(min($"vm").as("exact_value_micros"))
        pf.join(ranks, Seq("wk", "pct"))
          .join(exact, Seq("wk", "pct"))
          .select($"wk", $"pct", $"n_week", $"n_days",
            $"exact_value_micros",
            ($"r_le" >= $"target_rank" - $"err_bound" &&
              $"r_lt" <= $"target_rank" + $"err_bound" - 1L)
              .cast("long").as("within_certificate"))
          .orderBy($"wk", $"pct")
      },
      None)
  )
}
