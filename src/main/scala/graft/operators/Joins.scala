package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Join capability surface (SURVEY.md §2B "Joins"): inner / left / full /
  * semi / anti / cross equi-joins, theta (range) join, multi-way join with
  * agg, and a composed as-of join.
  *
  * Scale notes (100 TB): dimension sides (region/nation/customer/supplier/
  * part at TPC-H proportions) are explicitly `broadcast()` so fact scans
  * never shuffle for them; the only shuffle joins are fact-to-fact
  * (lineitem⋈orders) on their natural join key, which is also the key any
  * bucketing layout would use. AQE (enabled in the session) handles skew
  * and converts to broadcast when runtime sizes allow.
  */
object Joins extends QueryModule {

  override def queries: Seq[Q] = Seq(
    Q(
      "q10_join_inner_topn",
      "TPC-H Q3-style: broadcast dim filter (customer) + shuffled fact-fact " +
        "equi-join (orders⋈lineitem) + agg + top-N. revenue desc with " +
        "unique orderkey tiebreak keeps the limit deterministic.",
      (s, dir) => {
        import s.implicits._
        val c = Tables.t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" < lit("2000-01-01 00:00:00").cast("timestamp"))
        val l = Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" > lit("1999-06-30 00:00:00").cast("timestamp"))
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '2000-01-01'
          AND l_shipdate  > TIMESTAMP '1999-06-30'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    Q(
      "q11_join_left_outer",
      "Left outer join preserving all customers; per-customer order count " +
        "and spend (0 for order-less customers via coalesce).",
      (s, dir) => {
        import s.implicits._
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
        c.join(o, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey", $"c_name")
          .agg(
            count($"o_orderkey").as("n_orders"),
            round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name,
               count(o_orderkey)                             AS n_orders,
               round(coalesce(sum(o_totalprice), 0.0), 2)    AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey""")),

    Q(
      "q93_join_right_outer",
      "Right outer join preserving all customers (the RIGHT side): q11's " +
        "mirror with the fact table on the left — exercises Spark's " +
        "RightOuter path (build/stream sides swap vs left outer; same " +
        "single shuffle on the join key).",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
        val c = Tables.t(s, dir, "customer")
        o.join(c, $"o_custkey" === $"c_custkey", "right")
          .groupBy($"c_custkey", $"c_name")
          .agg(
            count($"o_orderkey").as("n_orders"),
            round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name,
               count(o_orderkey)                             AS n_orders,
               round(coalesce(sum(o_totalprice), 0.0), 2)    AS total_spent
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey""")),

    Q(
      "q12_join_semi",
      "Left-semi join (EXISTS): suppliers with at least one 2001 shipment. " +
        "Semi-join only carries the key — no row multiplication.",
      (s, dir) => {
        import s.implicits._
        val sup = Tables.t(s, dir, "supplier")
        val l = Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("2001-01-01 00:00:00").cast("timestamp"))
        sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_semi")
          .select($"s_suppkey", $"s_name")
          .orderBy($"s_suppkey")
      },
      Some("""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey
                        AND l_shipdate >= TIMESTAMP '2001-01-01')
        ORDER BY s_suppkey""")),

    Q(
      "q13_join_anti",
      "Left-anti join (NOT EXISTS): customers with no 1995 order.",
      (s, dir) => {
        import s.implicits._
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" < lit("1996-01-01 00:00:00").cast("timestamp"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate < TIMESTAMP '1996-01-01')
        ORDER BY c_custkey""")),

    Q(
      "q14_join_full_outer",
      "Full outer join of two pre-aggregated sides on nationkey; missing " +
        "sides surface as NULL counts.",
      (s, dir) => {
        import s.implicits._
        val cn = Tables.t(s, dir, "customer").filter($"c_acctbal" > 7000.0)
          .groupBy($"c_nationkey").agg(count(lit(1)).as("n_rich_customers"))
        val sn = Tables.t(s, dir, "supplier").filter($"s_acctbal" < 1000.0)
          .groupBy($"s_nationkey").agg(count(lit(1)).as("n_poor_suppliers"))
        cn.join(sn, $"c_nationkey" === $"s_nationkey", "full")
          .select(
            coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
            $"n_rich_customers", $"n_poor_suppliers")
          .orderBy($"nationkey")
      },
      Some("""
        WITH cn AS (SELECT c_nationkey, count(*) AS n_rich_customers
                    FROM customer WHERE c_acctbal > 7000.0 GROUP BY c_nationkey),
             sn AS (SELECT s_nationkey, count(*) AS n_poor_suppliers
                    FROM supplier WHERE s_acctbal < 1000.0 GROUP BY s_nationkey)
        SELECT coalesce(cn.c_nationkey, sn.s_nationkey) AS nationkey,
               n_rich_customers, n_poor_suppliers
        FROM cn FULL OUTER JOIN sn ON cn.c_nationkey = sn.s_nationkey
        ORDER BY nationkey""")),

    Q(
      "q15_join_cross",
      "Cross join of two tiny sides (region × distinct priorities) — " +
        "explicitly declared via crossJoin; both sides broadcastable.",
      (s, dir) => {
        import s.implicits._
        val r = Tables.t(s, dir, "region").select($"r_name")
        val p = Tables.t(s, dir, "orders").select($"o_orderpriority").distinct()
        r.crossJoin(p).orderBy($"r_name", $"o_orderpriority")
      },
      Some("""
        SELECT r_name, o_orderpriority
        FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
        ORDER BY r_name, o_orderpriority""")),

    Q(
      "q16_join_range_theta",
      "Theta (range) join: part banded by p_size BETWEEN lo AND hi against " +
        "an inline band table. Broadcast nested-loop on the 3-row side — " +
        "the right plan at any scale since the band table is constant-size.",
      (s, dir) => {
        import s.implicits._
        val bands = Seq((1, 16, "small"), (17, 33, "medium"), (34, 50, "large"))
          .toDF("lo", "hi", "band")
        Tables.t(s, dir, "part")
          .join(broadcast(bands), $"p_size" >= $"lo" && $"p_size" <= $"hi")
          .groupBy($"band")
          .agg(count(lit(1)).as("n_parts"), round(avg($"p_retailprice"), 4).as("avg_price"))
          .orderBy($"band")
      },
      Some("""
        SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
        FROM part
        JOIN (VALUES (1, 16, 'small'), (17, 33, 'medium'), (34, 50, 'large'))
             AS bands(lo, hi, band)
          ON p_size >= lo AND p_size <= hi
        GROUP BY band
        ORDER BY band""")),

    Q(
      "q17_multiway_join",
      "TPC-H Q5-style 6-table join: region→nation→customer→orders→lineitem→" +
        "supplier with co-nation condition; dims broadcast, facts shuffle " +
        "once on orderkey.",
      (s, dir) => {
        import s.implicits._
        val r = Tables.t(s, dir, "region").filter($"r_name" === "ASIA")
        val n = Tables.t(s, dir, "nation")
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
                  $"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp"))
        val l = Tables.t(s, dir, "lineitem")
        val sup = Tables.t(s, dir, "supplier")
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .join(broadcast(c),
            $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some("""
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")),

    Q(
      "q18_asof_join",
      "As-of join (composed op, SURVEY §2B): for each 'error' event, the " +
        "latest 'purchase' by the same user at-or-before it. Spark lacks a " +
        "builtin; composed as equi-join on user + range filter + " +
        "row_number()=1, which sort-merges on the user key. Oracle uses " +
        "DuckDB's native ASOF LEFT JOIN (ts cast to µs to match Spark's " +
        "timestamp precision).",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"event_id".as("err_id"), $"ts".as("err_ts"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("p_id"),
            $"ts".as("p_ts"), $"value".as("p_value"))
        val w = Window.partitionBy($"err_id").orderBy($"p_ts".desc, $"p_id".desc)
        errors
          .join(purchases,
            $"user_id" === $"p_user" && $"p_ts" <= $"err_ts", "left")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"err_id", $"p_id", round($"p_value", 2).as("p_value"))
          .orderBy($"err_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
                   FROM events WHERE event_type = 'error'),
             p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts,
                          value AS p_value
                   FROM events WHERE event_type = 'purchase')
        SELECT e.user_id, e.err_id, p.p_id, round(p.p_value, 2) AS p_value
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND p.p_ts <= e.err_ts
        ORDER BY e.err_id""")),

    Q(
      "q19_asof_join_native",
      "Same as-of semantics as q18, through the NATIVE operator " +
        "(graft.plans.AsOfJoinExec: custom LogicalPlan + Strategy + " +
        "physical sort-merge with O(1) per-partition state, vs q18's " +
        "materialize-all-candidates composition). Checked against the " +
        "same DuckDB ASOF oracle.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"event_id".as("err_id"), $"ts".as("err_ts"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("p_id"),
            $"ts".as("p_ts"), $"value".as("p_value"))
        graft.plans.AsOfJoin
          .asofJoin(errors, purchases, "user_id", "p_user", "err_ts", "p_ts",
            rightTiebreakCol = Some("p_id"))
          .select($"user_id", $"err_id", $"p_id", round($"p_value", 2).as("p_value"))
          .orderBy($"err_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
                   FROM events WHERE event_type = 'error'),
             p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts,
                          value AS p_value
                   FROM events WHERE event_type = 'purchase')
        SELECT e.user_id, e.err_id, p.p_id, round(p.p_value, 2) AS p_value
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND p.p_ts <= e.err_ts
        ORDER BY e.err_id""")),

    Q(
      "q100_asof_forward",
      "FORWARD as-of through the same native operator: for each 'error', " +
        "the EARLIEST 'purchase' by the same user at-or-after it — the " +
        "direction flip costs nothing new: both time columns negate to " +
        "epoch-micros longs (max(-t_r) <= -t_l is min(t_r) >= t_l) and " +
        "the exec's O(1)-state sort-merge runs unchanged. Ties on p_ts " +
        "resolve to max p_id (the exec's last-consumed-wins + p_id " +
        "tiebreak ordering), which the window oracle mirrors with " +
        "ORDER BY p_ts ASC, p_id DESC.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"event_id".as("err_id"), $"ts".as("err_ts"))
          .withColumn("neg_err_ts", -unix_micros($"err_ts".cast("timestamp")))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("p_id"),
            $"ts".as("p_ts"), $"value".as("p_value"))
          .withColumn("neg_p_ts", -unix_micros($"p_ts".cast("timestamp")))
        graft.plans.AsOfJoin
          .asofJoin(errors, purchases, "user_id", "p_user", "neg_err_ts", "neg_p_ts",
            rightTiebreakCol = Some("p_id"))
          .select($"user_id", $"err_id", $"p_id", round($"p_value", 2).as("p_value"))
          .orderBy($"err_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
                   FROM events WHERE event_type = 'error'),
             p AS (SELECT user_id AS p_user, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts,
                          value AS p_value
                   FROM events WHERE event_type = 'purchase'),
        cand AS (
          SELECT e.user_id, e.err_id, p.p_id, p.p_value,
                 row_number() OVER (PARTITION BY e.err_id
                   ORDER BY p.p_ts ASC, p.p_id DESC) AS rn
          FROM e LEFT JOIN p ON e.user_id = p.p_user AND p.p_ts >= e.err_ts)
        SELECT user_id, err_id, p_id, round(p_value, 2) AS p_value
        FROM cand WHERE rn = 1
        ORDER BY err_id""")),

    Q(
      "q138_shipping_priority",
      "TPC-H Q3-style shipping priority: unshipped BUILDING-segment " +
        "orders ranked by open revenue — customer dim broadcasts, " +
        "lineitem⋈orders shuffles once on orderkey, top-10 via " +
        "TakeOrderedAndProject (no global sort materialization). " +
        "Deterministic tiebreak (revenue desc, date, orderkey).",
      (s, dir) => {
        import s.implicits._
        val cut = lit("1997-01-01 00:00:00").cast("timestamp")
        val c = Tables.t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = Tables.t(s, dir, "orders").filter($"o_orderdate" < cut)
        val l = Tables.t(s, dir, "lineitem").filter($"l_shipdate" > cut)
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          // exact integer cents x basis points: the double sum's last-ULP
          // order dependence would flip round() at .xx5 boundaries across
          // engines; the integer sum is order-independent and exact
          .agg((sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long"))) / 10000.0)
            .as("revenue"))
          .select($"l_orderkey", $"revenue",
            $"o_orderdate".cast("date").as("o_orderdate"), $"o_orderpriority")
          .orderBy($"revenue".desc, $"o_orderdate", $"l_orderkey")
          .limit(10)
      },
      Some("""
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
                 / 10000.0 AS revenue,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10""")),

    Q(
      "q139_returned_items",
      "TPC-H Q10-style returned-item report: customers ranked by revenue " +
        "lost to returns in one quarter — the quarter filter prunes " +
        "orders before the fact shuffle, the R-flag filter prunes " +
        "lineitem at the scan (both visible as PushedFilters), nation " +
        "broadcasts, top-20 via TakeOrderedAndProject.",
      (s, dir) => {
        import s.implicits._
        val c = Tables.t(s, dir, "customer")
        val n = Tables.t(s, dir, "nation")
        val o = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            $"o_orderdate" < lit("1996-04-01 00:00:00").cast("timestamp"))
        val l = Tables.t(s, dir, "lineitem").filter($"l_returnflag" === "R")
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
          // same exact cents x basis-points arithmetic as q138
          .agg((sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long"))) / 10000.0)
            .as("revenue"))
          .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS BIGINT)
                 / 10000.0 AS revenue,
               c_acctbal, n_name
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    Q(
      "q133_bucketed_interval_join",
      "Time-range theta join EQUI-IZED by bucketing — the 100 TB form of " +
        "'each purchase joined to the same user's clicks in the " +
        "preceding hour' (q76's batch semantics): both sides key on " +
        "(user_id, hour_bucket); each purchase additionally probes the " +
        "previous bucket (a 1-hour window can only span 2 buckets, and " +
        "since a click's bucket is unique each qualifying pair matches " +
        "EXACTLY once — no dedup needed); the exact time predicate then " +
        "filters bucket-collision survivors. Turns an unboundable " +
        "theta join into a hash equi-join whose shuffle keys carry the " +
        "skew-handling AQE already knows; the naive NLJ compares every " +
        "(purchase, click) pair per user. Same oracle as q76 — the " +
        "third physical shape (batch-bucketed) for the one semantics, " +
        "next to the streaming watermarked join.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .withColumn("epoch", unix_micros($"ts".cast("timestamp")))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("c_id"), $"epoch".as("c_ep"),
            expr("epoch div 3600000000").as("bk"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("p_id"), $"epoch".as("p_ep"),
            explode(array(expr("epoch div 3600000000"),
              expr("epoch div 3600000000 - 1"))).as("bk"))
        purchases.join(clicks, Seq("user_id", "bk"))
          .filter($"c_ep" <= $"p_ep" && $"c_ep" >= $"p_ep" - 3600000000L)
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct($"p_id").as("n_purchases_with_click"))
      },
      Some("""
        SELECT count(*) AS n_pairs,
               count(DISTINCT p.event_id) AS n_purchases_with_click
        FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR""")),

    Q(
      "q122_cdc_merge",
      "MERGE INTO / upsert semantics as a single full-outer-join pass — " +
        "the CDC apply step a daily-maintained 100 TB corpus runs: a " +
        "change-set of inserts (keys ≡3 mod 10, absent from the base " +
        "snapshot), updates (≡7, price bumped +1000.0 — exact double " +
        "add, no rounding ambiguity) and deletes (≡9) is applied in ONE " +
        "sort-merge join on the merge key (full-outer joins cannot " +
        "broadcast, so the shuffle is structural — and it keys on " +
        "exactly the column a 100 TB table would be bucketed by, which " +
        "makes the exchange vanish under a bucketed layout, see " +
        "BucketingSpec); matched-update takes the change row, " +
        "matched-delete drops, unmatched-insert appends, unmatched-base " +
        "passes through. Audited per priority with insert/update " +
        "provenance counts.",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
        val base = o.filter($"o_orderkey" % 10 =!= 3)
        val changes = o.filter(($"o_orderkey" % 10).isin(3, 7, 9))
          .select(
            $"o_orderkey".as("c_key"),
            when($"o_orderkey" % 10 === 3, "I")
              .when($"o_orderkey" % 10 === 7, "U").otherwise("D").as("op"),
            ($"o_totalprice" +
              when($"o_orderkey" % 10 === 7, 1000.0).otherwise(0.0)).as("c_price"),
            $"o_orderpriority".as("c_priority"))
        base.join(changes, $"o_orderkey" === $"c_key", "full_outer")
          .filter(coalesce($"op", lit("")) =!= "D")
          .select(
            coalesce($"c_priority", $"o_orderpriority").as("priority"),
            when($"op".isNotNull, $"c_price").otherwise($"o_totalprice").as("price"),
            $"op")
          .groupBy($"priority")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when($"op" === "I", 1L).otherwise(0L)).as("n_inserted"),
            sum(when($"op" === "U", 1L).otherwise(0L)).as("n_updated"),
            round(sum($"price"), 2).as("revenue"))
          .orderBy($"priority")
      },
      Some("""
        WITH changes AS (
          SELECT o_orderkey AS c_key,
                 CASE WHEN o_orderkey % 10 = 3 THEN 'I'
                      WHEN o_orderkey % 10 = 7 THEN 'U' ELSE 'D' END AS op,
                 o_totalprice + CASE WHEN o_orderkey % 10 = 7
                                     THEN 1000.0 ELSE 0.0 END AS c_price,
                 o_orderpriority AS c_priority
          FROM orders WHERE o_orderkey % 10 IN (3, 7, 9)),
        base AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 3),
        merged AS (
          SELECT coalesce(c_priority, o_orderpriority) AS priority,
                 CASE WHEN op IS NOT NULL THEN c_price
                      ELSE o_totalprice END AS price,
                 op
          FROM base FULL OUTER JOIN changes ON o_orderkey = c_key
          WHERE coalesce(op, '') <> 'D')
        SELECT priority,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
               CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
               round(sum(price), 2) AS revenue
        FROM merged
        GROUP BY priority
        ORDER BY priority""")),

    Q(
      "q155_fuzzy_join",
      "FUZZY (approximate-string) JOIN — entity resolution: corrupted " +
        "nation names (leading character dropped, the deterministic " +
        "probe set) matched back to the reference table at edit " +
        "distance <= 1 via TRIGRAM BLOCKING + exact levenshtein " +
        "confirm. The blocking join is equi on a shared character " +
        "3-gram; only blocked candidates pay the O(len^2) distance. " +
        "Losslessness is a PROBE-SET property, not a general edit-" +
        "distance-1 guarantee: deletion corruption leaves every trigram " +
        "right of the edit intact, so these probes always share one — " +
        "a mid-string substitution in a 4-char name would not (general " +
        "q-gram blocking needs the count bound |shared| >= max(len) - " +
        "q + 1 - q*d, or padded grams). The fixture tables are " +
        "small, but the SHAPE is the 100 TB one: a quadratic cross join " +
        "never appears — candidates come from an inverted trigram " +
        "index, exactly the q62->q101 ladder applied to strings instead " +
        "of documents. Oracle computes the full cross join + distance " +
        "filter: bit-equality CHECKS the losslessness argument above " +
        "against this probe set every round.",
      (s, dir) => {
        import s.implicits._
        val names = Tables.t(s, dir, "nation").select($"n_name")
        val probes = names.select(substring($"n_name", 2, 100).as("probe"))
        def trigrams(name: String) =
          expr(s"transform(sequence(1, greatest(length($name) - 2, 1)), " +
            s"i -> substring($name, i, 3))")
        val pt = probes.select($"probe", explode(array_distinct(trigrams("probe"))).as("g"))
        val nt = names.select($"n_name", explode(array_distinct(trigrams("n_name"))).as("g"))
        pt.join(nt, Seq("g"))
          .select($"probe", $"n_name").distinct()
          .filter(levenshtein($"probe", $"n_name") <= 1)
          .orderBy($"probe", $"n_name")
      },
      Some("""
        WITH probes AS (SELECT substr(n_name, 2) AS probe FROM nation)
        SELECT p.probe, n.n_name
        FROM probes p CROSS JOIN nation n
        WHERE levenshtein(p.probe, n.n_name) <= 1
        ORDER BY p.probe, n.n_name""")),

    Q(
      "q161_asof_tolerance",
      "As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`, " +
        "kdb wj's window bound — the as-of variant q18/q19/q100 don't " +
        "cover): each error event takes the latest same-user purchase " +
        "at-or-before it ONLY if it happened within the last 30 " +
        "minutes; staler matches are nulled but the left row survives " +
        "(a stale attribution is worse than none). Same single " +
        "user-keyed sort-merge shape as q18 — the tolerance is a " +
        "post-match conditional, NOT a join-condition change, so the " +
        "candidate space and shuffle are identical to the untoleranced " +
        "as-of. Ties on (user_id, p_ts) break by p_id desc on BOTH " +
        "sides — the oracle is a window (row_number) with the same " +
        "tie-break, not DuckDB's ASOF JOIN, whose pick among equal " +
        "timestamps is arbitrary and would make the gate fixture-" +
        "dependent.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
        val errors = ev.filter($"event_type" === "error")
          .select($"user_id", $"event_id".as("err_id"), $"ts".as("err_ts"))
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"event_id".as("p_id"), $"ts".as("p_ts"))
        val w = Window.partitionBy($"err_id").orderBy($"p_ts".desc, $"p_id".desc)
        val within = $"p_ts" >= $"err_ts" - expr("INTERVAL 30 MINUTES")
        errors
          .join(purchases,
            $"user_id" === $"p_user" && $"p_ts" <= $"err_ts", "left")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"err_id",
            when(within, $"p_id").as("p_id"),
            // NTZ has no direct long cast; the timestamp hop is
            // value-preserving under the session's fixed UTC zone
            when(within,
              ($"err_ts".cast("timestamp").cast("long") -
                $"p_ts".cast("timestamp").cast("long"))).as("gap_sec"))
          .orderBy($"err_id")
      },
      Some("""
        WITH e AS (SELECT user_id, event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
                   FROM events WHERE event_type = 'error'),
             p AS (SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts
                   FROM events WHERE event_type = 'purchase'),
             j AS (SELECT e.user_id, e.err_id, e.err_ts, p.p_id, p.p_ts,
                          row_number() OVER (PARTITION BY e.err_id
                                             ORDER BY p.p_ts DESC, p.p_id DESC) AS rn
                   FROM e LEFT JOIN p
                     ON e.user_id = p.user_id AND p.p_ts <= e.err_ts)
        SELECT user_id, err_id,
               CASE WHEN p_ts >= err_ts - INTERVAL 30 MINUTE
                    THEN p_id END AS p_id,
               CASE WHEN p_ts >= err_ts - INTERVAL 30 MINUTE
                    THEN CAST(floor(epoch(err_ts)) - floor(epoch(p_ts)) AS BIGINT)
                    END AS gap_sec
        FROM j WHERE rn = 1
        ORDER BY err_id""")),

    Q(
      "q270_spatial_grid_join",
      "SPATIAL GRID-BUCKETED DISTANCE JOIN — the 2-D member of the " +
        "equi-ization family (q133 buckets time ranges, q189 buckets " +
        "intervals into weeks; this buckets the PLANE): customers and " +
        "suppliers get deterministic synthetic coordinates on a " +
        "200x200 grid (LCG-mixed keys, DIFFERENT multipliers per table " +
        "so the two point sets are uncorrelated — the fixtures carry " +
        "no geo columns, so the geometry is derived, q204's seed " +
        "recipe), and " +
        "all pairs within L-inf distance 10 are found by hashing " +
        "points into 10-unit cells and replicating the SMALL side to " +
        "its 3x3 neighbor cells (explode of a 9-element constant — " +
        "replication factor is fixed at 9 regardless of data size, and " +
        "each qualifying pair meets in EXACTLY one cell, so no " +
        "post-join dedup). The join itself is a plain equi-join on " +
        "(cell_x, cell_y) + the exact distance residual — Catalyst " +
        "never sees a theta join, the cell domain " +
        "spreads uniformly under shuffle, and the same plan holds for " +
        "geohash/S2 cells at planet scale. Output: pair count per " +
        "exact L-inf distance (the distance histogram a radius sweep " +
        "reads). Oracle: the quadratic cross-join ground truth, " +
        "feasible at sf0.01 (150k candidate pairs) where the grid " +
        "plan's candidate set is ~100x smaller.",
      (s, dir) => {
        import s.implicits._
        val M = 2147483647L
        val cust = Tables.t(s, dir, "customer")
          .select($"c_custkey".as("cid"),
            (($"c_custkey" * 48271L) % M % 200).as("ax"),
            (($"c_custkey" * 16807L) % M % 200).as("ay"))
        val supp = Tables.t(s, dir, "supplier")
          .select($"s_suppkey".as("sid"),
            (($"s_suppkey" * 69621L) % M % 200).as("bx"),
            (($"s_suppkey" * 40692L) % M % 200).as("by"))
        val custCells = cust
          .withColumn("cx", expr("ax div 10"))
          .withColumn("cy", expr("ay div 10"))
        val suppCells = supp
          .select($"sid", $"bx", $"by",
            explode(expr("sequence(-1, 1)")).as("dx"))
          .select($"sid", $"bx", $"by", $"dx",
            explode(expr("sequence(-1, 1)")).as("dy"))
          .select($"sid", $"bx", $"by",
            (expr("bx div 10") + $"dx").as("cx"),
            (expr("by div 10") + $"dy").as("cy"))
        custCells.join(suppCells, Seq("cx", "cy"))
          .filter(abs($"ax" - $"bx") <= 10 && abs($"ay" - $"by") <= 10)
          .select(greatest(abs($"ax" - $"bx"), abs($"ay" - $"by"))
            .as("dist_linf"))
          .groupBy($"dist_linf")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy($"dist_linf")
      },
      Some("""
        WITH c AS (
          SELECT c_custkey AS cid,
                 (c_custkey * 48271) % 2147483647 % 200 AS ax,
                 (c_custkey * 16807) % 2147483647 % 200 AS ay
          FROM customer),
        s AS (
          SELECT s_suppkey AS sid,
                 (s_suppkey * 69621) % 2147483647 % 200 AS bx,
                 (s_suppkey * 40692) % 2147483647 % 200 AS by
          FROM supplier),
        pairs AS (
          SELECT greatest(abs(ax - bx), abs(ay - by)) AS dist_linf
          FROM c, s
          WHERE abs(ax - bx) <= 10 AND abs(ay - by) <= 10)
        SELECT CAST(dist_linf AS BIGINT) AS dist_linf,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY dist_linf ORDER BY dist_linf""")),

    Q(
      "q342_small_qty_revenue",
      "CORRELATED SCALAR SUBQUERY, DECORRELATED (the TPC-H Q17 shape): " +
        "revenue from Brand#1 lineitems whose quantity is below 20% of " +
        "that part's average quantity — the classic 'per-row scalar " +
        "subquery' a naive engine re-executes per lineitem. Spark-" +
        "first: the subquery becomes WINDOW aggregates over the " +
        "brand slice's partkey partition — lineitem is scanned ONCE " +
        "(brand filter via broadcast part semi-join prunes it to the " +
        "brand's ~2% slice first), one exchange on partkey, zero " +
        "rejoin (the agg-then-broadcast-back formulation scans " +
        "twice). The 0.2*avg comparison is cross-multiplied to exact " +
        "integers — 5*qty*cnt < sum(qty) — so no double rounding can " +
        "flip a boundary row on either engine; revenue is exact " +
        "cents, avg_yearly = cents div 7 (non-negative, div == //). " +
        "Per-part groups are small (a part has bounded lineitems), " +
        "so the window partition cannot skew at any scale.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val brandParts = broadcast(Tables.t(s, dir, "part")
          .filter($"p_brand" === "Brand#1").select($"p_partkey"))
        val li = Tables.t(s, dir, "lineitem")
          .join(brandParts, $"l_partkey" === $"p_partkey")
          .select($"l_partkey", $"l_quantity".cast("long").as("qty"),
            round($"l_extendedprice" * 100).cast("long").as("cents"))
        val w = Window.partitionBy($"l_partkey")
        li.withColumn("s", sum($"qty").over(w))
          .withColumn("c", count(lit(1)).over(w))
          .filter($"qty" * 5L * $"c" < $"s")
          .agg(count(lit(1)).as("n_lineitems"),
            sum($"cents").as("total_cents"))
          .withColumn("avg_yearly_cents",
            expr("total_cents div 7"))
      },
      Some("""
        WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
        li AS (
          SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                 CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
          FROM lineitem JOIN pk ON l_partkey = p_partkey),
        ag AS (SELECT l_partkey AS apk, CAST(sum(qty) AS BIGINT) AS s,
                      CAST(count(*) AS BIGINT) AS c
               FROM li GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(cents) // 7 AS BIGINT) AS avg_yearly_cents
        FROM li JOIN ag ON l_partkey = apk
        WHERE qty * 5 * c < s""")),

    Q(
      "q343_waiting_supplier",
      "MULTI-EXISTS / NOT-EXISTS DECORRELATION (the TPC-H Q21 shape, " +
        "'suppliers who kept orders waiting'): suppliers whose line in " +
        "a MULTI-supplier order shipped late (> 60 days after the " +
        "order date) while EVERY other supplier in that order shipped " +
        "on time. The textbook form is EXISTS(another supplier) AND " +
        "NOT EXISTS(another late supplier) — two correlated probes per " +
        "row. Spark-first both collapse into ONE orderkey-grain " +
        "aggregate over the distinct (order, supplier, late) frame: " +
        "n_supp > 1 replaces EXISTS, n_late = 1 replaces NOT EXISTS " +
        "(the candidate itself is late, so 'no OTHER late supplier' " +
        "is exactly n_late = 1). The per-order stats are WINDOW " +
        "aggregates over the (order, supplier) frame's orderkey " +
        "partition — not a self-join, so lineitem and orders are " +
        "each scanned ONCE (the self-join formulation re-ran the " +
        "whole join per consumer; PlanSpec pins the 3-scan shape); " +
        "supplier names attach by broadcast, top-10 by waits with " +
        "deterministic name tie-break. Lateness compares raw " +
        "timestamps — no epoch arithmetic to drift cross-engine.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val f = Tables.t(s, dir, "lineitem")
          .join(Tables.t(s, dir, "orders"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_orderkey", $"l_suppkey")
          .agg(max(when($"l_shipdate" >
            $"o_orderdate" + expr("INTERVAL 60 DAYS"), 1L)
            .otherwise(0L)).as("late"))
        val w = Window.partitionBy($"l_orderkey")
        val waits = f
          .withColumn("n_supp", count(lit(1)).over(w))
          .withColumn("n_late", sum($"late").over(w))
          .filter($"late" === 1L && $"n_supp" > 1L && $"n_late" === 1L)
          .groupBy($"l_suppkey").agg(count(lit(1)).as("numwait"))
        waits.join(broadcast(Tables.t(s, dir, "supplier")),
            $"l_suppkey" === $"s_suppkey")
          .orderBy($"numwait".desc, $"s_name").limit(10)
          .withColumn("rk", row_number().over(
            Window.orderBy($"numwait".desc, $"s_name")).cast("long"))
          .select($"rk", $"s_name", $"numwait")
          .orderBy($"rk")
      },
      Some("""
        WITH f AS (
          SELECT l_orderkey, l_suppkey,
                 max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        os AS (SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
               FROM f GROUP BY 1),
        waits AS (
          SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
          FROM f JOIN os USING (l_orderkey)
          WHERE late = 1 AND n_supp > 1 AND n_late = 1
          GROUP BY 1),
        r AS (SELECT CAST(row_number() OVER
                (ORDER BY numwait DESC, s_name) AS BIGINT) AS rk,
                s_name, numwait
              FROM waits JOIN supplier ON l_suppkey = s_suppkey)
        SELECT rk, s_name, numwait FROM r WHERE rk <= 10 ORDER BY rk""")),

    Q(
      "q344_idle_rich_customers",
      "GLOBAL-AGGREGATE FILTER + ANTI JOIN (the TPC-H Q22 shape, " +
        "'positive-balance customers above the global positive " +
        "average with no recent orders'): per nation, how many " +
        "above-average-balance customers placed NO order in the " +
        "trailing 60 days of the order history, and their total " +
        "balance — the lapsed-high-value segment a win-back campaign " +
        "targets. Spark-first: the scalar subquery (global positive " +
        "avg) is a 1-row broadcast crossJoin; above-average is " +
        "cross-multiplied exact — bal_cents * n_pos > sum_pos_cents " +
        "(no division, no boundary flips); 'no recent order' is a " +
        "LEFT ANTI join on custkey against the cutoff-filtered " +
        "orders (the cutoff itself = max(o_orderdate) - 60 days, a " +
        "second 1-row broadcast — data-derived, so the query needs " +
        "no wall clock); nation names attach by broadcast. 100 TB: " +
        "customer and orders are each scanned once; the anti join is " +
        "one shuffle on custkey, and everything else is 1-row or " +
        "25-row broadcast.",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.t(s, dir, "customer")
          .select($"c_custkey", $"c_nationkey",
            round($"c_acctbal" * 100).cast("long").as("bal_cents"))
        val g = broadcast(cust.filter($"bal_cents" > 0)
          .agg(sum($"bal_cents").as("sum_pos"),
            count(lit(1)).as("n_pos")))
        val cutoff = broadcast(Tables.t(s, dir, "orders")
          .agg((max($"o_orderdate") - expr("INTERVAL 60 DAYS"))
            .as("cut")))
        val recent = Tables.t(s, dir, "orders").crossJoin(cutoff)
          .filter($"o_orderdate" >= $"cut")
          .select($"o_custkey").distinct()
        cust.crossJoin(g)
          .filter($"bal_cents" * $"n_pos" > $"sum_pos")
          .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
          .join(broadcast(Tables.t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("numcust"),
            sum($"bal_cents").as("totacctbal_cents"))
          .orderBy($"n_name")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
          FROM customer),
        g AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_pos,
                     CAST(count(*) AS BIGINT) AS n_pos
              FROM cust WHERE bal_cents > 0),
        cutoff AS (SELECT max(o_orderdate) - INTERVAL 60 DAY AS cut
                   FROM orders),
        recent AS (SELECT DISTINCT o_custkey
                   FROM orders, cutoff WHERE o_orderdate >= cut)
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        FROM cust CROSS JOIN g
        JOIN nation ON c_nationkey = n_nationkey
        WHERE bal_cents * n_pos > sum_pos
          AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        GROUP BY n_name ORDER BY n_name""")),

    Q(
      "q345_null_safe_join",
      "NULL-SAFE EQUALITY JOIN (`<=>` / IS NOT DISTINCT FROM) vs plain " +
        "`=` — the reconciliation-join semantics gap every warehouse " +
        "hits when an 'unknown' dimension member is encoded as NULL: " +
        "plain equality silently DROPS every NULL-keyed fact (NULL = " +
        "NULL is not true), while the null-safe operator matches " +
        "NULL to NULL exactly once. Here the BUILDING segment plays " +
        "the unknown (nullif), the dim is the 5-key distinct " +
        "(4 names + NULL), and the output is the side-by-side ledger " +
        "per join kind: matched rows, matched distinct customers, " +
        "and the NULL-keyed row count each semantics kept. Catalyst " +
        "plans `<=>` as an EqualNullSafe BroadcastHashJoin key — " +
        "same hash-join machinery, no fallback to a nested loop (a " +
        "naive engine degrades null-safe joins to theta joins). " +
        "Both joins broadcast the 5-row dim; one customer scan per " +
        "branch of the union (2 total, both column-pruned).",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.t(s, dir, "customer")
          .select($"c_custkey",
            nullif($"c_mktsegment", lit("BUILDING")).as("seg"))
        val dim = broadcast(cust.select($"seg").distinct()
          .select($"seg".as("dseg")))
        def ledger(joined: org.apache.spark.sql.DataFrame, kind: String) =
          joined.agg(
            count(lit(1)).as("matched_rows"),
            countDistinct($"c_custkey").as("matched_custs"),
            sum(when($"seg".isNull, 1L).otherwise(0L))
              .as("null_key_rows"))
            .withColumn("join_kind", lit(kind))
        ledger(cust.join(dim, $"seg" === $"dseg"), "equal")
          .unionAll(ledger(cust.join(dim, $"seg" <=> $"dseg"),
            "null_safe"))
          .select($"join_kind", $"matched_rows", $"matched_custs",
            $"null_key_rows")
          .orderBy($"join_kind")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
          FROM customer),
        dim AS (SELECT DISTINCT seg AS dseg FROM cust),
        eq AS (
          SELECT 'equal' AS join_kind,
                 CAST(count(*) AS BIGINT) AS matched_rows,
                 CAST(count(DISTINCT c_custkey) AS BIGINT)
                   AS matched_custs,
                 CAST(sum(CASE WHEN seg IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_key_rows
          FROM cust JOIN dim ON seg = dseg),
        ns AS (
          SELECT 'null_safe' AS join_kind,
                 CAST(count(*) AS BIGINT) AS matched_rows,
                 CAST(count(DISTINCT c_custkey) AS BIGINT)
                   AS matched_custs,
                 CAST(sum(CASE WHEN seg IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS null_key_rows
          FROM cust JOIN dim ON seg IS NOT DISTINCT FROM dseg)
        SELECT join_kind, matched_rows, matched_custs, null_key_rows
        FROM (SELECT * FROM eq UNION ALL SELECT * FROM ns)
        ORDER BY join_kind""")),

    Q(
      "q357_top_supplier",
      "SCALAR-SUBQUERY-EQUALS-GLOBAL-MAX decorrelation (the TPC-H Q15 " +
        "shape, completing the Q17/Q21/Q22 trio q342-q344): suppliers " +
        "whose Q1-1996 shipped revenue equals the maximum over ALL " +
        "suppliers. The textbook form computes the revenue view twice " +
        "(once in the scalar subquery); Spark-first the view is " +
        "aggregated ONCE and the global max attaches as an " +
        "unpartitioned WINDOW MAX over the <=100-row supplier-revenue " +
        "frame — bounded by the supplier domain, never by lineitem " +
        "rows, so the empty-partition window is safe at any fact " +
        "scale. Revenue is exact integer cents (round(price*(1-disc)" +
        "*100) per row — identical IEEE expression on both engines). " +
        "Ties all surface (that IS Q15's semantics), name attaches by " +
        "broadcast. 100 TB: one date-pruned lineitem scan -> one " +
        "suppkey aggregate; the max costs nothing.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val rev = Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
          .groupBy($"l_suppkey")
          .agg(sum(expr("cast(round(l_extendedprice * " +
            "(1 - l_discount) * 100) as bigint)")).as("revenue_cents"))
        rev
          .withColumn("max_rev",
            max($"revenue_cents").over(
              Window.partitionBy(lit(1))))
          .filter($"revenue_cents" === $"max_rev")
          .join(broadcast(Tables.t(s, dir, "supplier")),
            $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey".cast("long").as("s_suppkey"), $"s_name",
            $"revenue_cents")
          .orderBy($"s_suppkey")
      },
      Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(round(l_extendedprice * (1 - l_discount)
                   * 100) AS BIGINT)) AS revenue_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
               CAST(revenue_cents AS BIGINT) AS revenue_cents
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)
        ORDER BY s_suppkey""")),

    Q(
      "q361_bloom_semi_reduction",
      "BLOOM-FILTER SEMI-JOIN REDUCTION AUDIT (Bloom 1970 applied as " +
        "the distributed semi-join reducer of Bernstein-Chiu 1981 — " +
        "what Spark's runtime rowgroup bloom filters do implicitly, " +
        "made EXPLICIT and measured): a k=2, m=4093-bit bloom built " +
        "over the BUILDING-segment customer keys pre-filters orders " +
        "before any shuffle would happen. The hash is a deliberately " +
        "ENGINE-PORTABLE integer mixer ((key*2654435761 + 1) % 4093 " +
        "and (key*40503 + 7) % 4093 — Knuth multiplicative hashing, " +
        "no 64-bit overflow at any fixture scale), so unlike " +
        "xxhash64-based sketches the ENTIRE filter — build, probe, " +
        "false-positive census — is bit-reproducible in the DuckDB " +
        "oracle. The filter is materialized as its SET-BIT TABLE " +
        "(<= 4093 rows) and probed by two broadcast semi-joins; no " +
        "false negative is POSSIBLE by construction (a real match " +
        "sets both its bits), and the audit row measures what the " +
        "bloom buys: facts, exact matches, bloom passes, false " +
        "positives, fp ppm among true negatives, and bits set. " +
        "100 TB: the bit table broadcasts (kilobytes); orders is " +
        "scanned once and reduced BEFORE the expensive join — the " +
        "exact semi-join here exists only to grade the filter.",
      (s, dir) => {
        import s.implicits._
        val dim = Tables.t(s, dir, "customer")
          .filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey".as("k"))
        val bits = dim.select(explode(array(
            ($"k" * 2654435761L + 1) % 4093,
            ($"k" * 40503L + 7) % 4093)).as("b"))
          .distinct()
        val facts = Tables.t(s, dir, "orders")
          .select($"o_custkey".as("fk"))
        val pass = facts
          .join(broadcast(bits),
            ($"fk" * 2654435761L + 1) % 4093 === $"b", "left_semi")
          .join(broadcast(bits.withColumnRenamed("b", "b2")),
            ($"fk" * 40503L + 7) % 4093 === $"b2", "left_semi")
        val cN = broadcast(facts.agg(count(lit(1)).as("n_facts")))
        val cD = broadcast(dim.agg(count(lit(1)).as("n_dim_keys")))
        val cB = broadcast(bits.agg(count(lit(1)).as("n_bits_set")))
        val cE = broadcast(facts.join(broadcast(dim), $"fk" === $"k",
          "left_semi").agg(count(lit(1)).as("n_exact")))
        val cP = broadcast(pass.agg(count(lit(1)).as("n_bloom_pass")))
        cN.crossJoin(cD).crossJoin(cB).crossJoin(cE).crossJoin(cP)
          .select($"n_facts", $"n_dim_keys", $"n_bits_set", $"n_exact",
            $"n_bloom_pass",
            ($"n_bloom_pass" - $"n_exact").as("false_pos"),
            // nullif: if every fact key matches the dim segment there
            // are no true negatives to grade — NULL, not a zero-divide
            expr("(n_bloom_pass - n_exact) * 1000000 div " +
              "nullif(n_facts - n_exact, 0)").as("fp_ppm"))
      },
      Some("""
        WITH dim AS (
          SELECT c_custkey AS k FROM customer
          WHERE c_mktsegment = 'BUILDING'),
        bits AS (
          SELECT DISTINCT b FROM (
            SELECT (k * 2654435761 + 1) % 4093 AS b FROM dim
            UNION ALL
            SELECT (k * 40503 + 7) % 4093 AS b FROM dim)),
        facts AS (SELECT o_custkey AS fk FROM orders),
        pass AS (
          SELECT fk FROM facts
          WHERE (fk * 2654435761 + 1) % 4093 IN (SELECT b FROM bits)
            AND (fk * 40503 + 7) % 4093 IN (SELECT b FROM bits)),
        ex AS (
          SELECT fk FROM facts
          WHERE fk IN (SELECT k FROM dim)),
        c AS (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM facts)
                   AS n_facts,
                 (SELECT CAST(count(*) AS BIGINT) FROM dim)
                   AS n_dim_keys,
                 (SELECT CAST(count(*) AS BIGINT) FROM bits)
                   AS n_bits_set,
                 (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_exact,
                 (SELECT CAST(count(*) AS BIGINT) FROM pass)
                   AS n_bloom_pass)
        SELECT n_facts, n_dim_keys, n_bits_set, n_exact, n_bloom_pass,
               n_bloom_pass - n_exact AS false_pos,
               CAST((n_bloom_pass - n_exact) * 1000000
                 // nullif(n_facts - n_exact, 0) AS BIGINT) AS fp_ppm
        FROM c""")),

    Q(
      "q367_volume_shipping",
      "INTERNATIONAL VOLUME SHIPPING (the TPC-H Q7 shape — the " +
        "canonical star-join stress: lineitem fans to supplier-nation " +
        "on one side and orders-customer-nation on the other, " +
        "bidirectional REGION-pair filter, revenue by (supp_region, " +
        "cust_region, ship_year); regions rather than Q7's nations so " +
        "every sf fixture populates both directions): the PLAN is the " +
        "point — the region-filtered supplier side (1 of 5 regions) " +
        "BROADCASTS and prunes lineitem ~5x BEFORE the one " +
        "unavoidable fact-fact exchange (lineitem-orders on " +
        "orderkey), and the orders side is itself region-pruned ~5x " +
        "by its broadcast customer join before that same exchange — " +
        "both shuffle inputs shrink ahead of the wire, which at " +
        "100 TB is the whole game. Revenue in exact integer cents " +
        "(the q357 per-row rounding convention). The region pair " +
        "(0,1)<->(1,0) keeps both directions, TPC-H's semantics.",
      (s, dir) => {
        import s.implicits._
        val li = Tables.t(s, dir, "lineitem")
        val nat01 = Tables.t(s, dir, "nation")
          .filter($"n_regionkey" === 0 || $"n_regionkey" === 1)
        val sup = Tables.t(s, dir, "supplier")
          .join(broadcast(nat01), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_regionkey".as("supp_region"))
        val cust = Tables.t(s, dir, "orders")
          .join(broadcast(Tables.t(s, dir, "customer")
              .join(broadcast(nat01
                .select($"n_nationkey".as("cn_key"),
                  $"n_regionkey".as("cust_region"))),
                $"c_nationkey" === $"cn_key")
              .select($"c_custkey", $"cust_region")),
            $"o_custkey" === $"c_custkey")
          .select($"o_orderkey", $"cust_region")
        li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
          .join(cust, $"l_orderkey" === $"o_orderkey")
          .filter(($"supp_region" === 0 && $"cust_region" === 1) ||
            ($"supp_region" === 1 && $"cust_region" === 0))
          .groupBy($"supp_region".cast("long").as("supp_region"),
            $"cust_region".cast("long").as("cust_region"),
            year($"l_shipdate").cast("long").as("ship_year"))
          .agg(sum(expr("cast(round(l_extendedprice * " +
            "(1 - l_discount) * 100) as bigint)")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
          .orderBy($"supp_region", $"cust_region", $"ship_year")
      },
      Some("""
        SELECT CAST(sn.n_regionkey AS BIGINT) AS supp_region,
               CAST(cn.n_regionkey AS BIGINT) AS cust_region,
               CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                 * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN supplier s ON l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE (sn.n_regionkey = 0 AND cn.n_regionkey = 1)
           OR (sn.n_regionkey = 1 AND cn.n_regionkey = 0)
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3""")),

    Q(
      "q375_shipmode_priority",
      "SHIPPING MODES AND ORDER PRIORITY (the TPC-H Q12 shape): for " +
        "each late-shipment year, how many HIGH-priority vs other " +
        "orders shipped late — the conditional-aggregate-over-join " +
        "pattern (no second scan, no CASE-filtered self-join: both " +
        "priority classes are branches of ONE aggregate). 'Late' = " +
        "shipped more than 60 days after the order date, raw " +
        "timestamp comparison (q343's no-epoch-drift rule). Plan: " +
        "lineitem joins orders on the one unavoidable orderkey " +
        "exchange, then a bounded (year) aggregate with map-side " +
        "partials. 100 TB: one exchange; the CASE branches are free.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .join(Tables.t(s, dir, "orders"),
            $"l_orderkey" === $"o_orderkey")
          .filter($"l_shipdate" >
            $"o_orderdate" + expr("INTERVAL 60 DAYS"))
          .groupBy(year($"l_shipdate").cast("long").as("ship_year"))
          .agg(
            sum(($"o_orderpriority" === "1-URGENT" ||
              $"o_orderpriority" === "2-HIGH").cast("long"))
              .as("high_line_count"),
            sum((!($"o_orderpriority" === "1-URGENT" ||
              $"o_orderpriority" === "2-HIGH")).cast("long"))
              .as("low_line_count"))
          .orderBy($"ship_year")
      },
      Some("""
        SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum(CASE WHEN o_orderpriority IN
                 ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN
                 ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY 1 ORDER BY 1""")),

    Q(
      "q376_promo_revenue_share",
      "PROMOTION REVENUE SHARE (the TPC-H Q14 shape): what fraction " +
        "of one month's revenue came from promoted parts — the " +
        "conditional-sum-over-ratio pattern, exact: both the promo " +
        "numerator and the total denominator are integer-cents " +
        "branches of ONE aggregate over the date-pruned " +
        "lineitem-part join (part BROADCASTS — never a fact " +
        "shuffle), and the share is one cross-multiplied ppm " +
        "division at the end. 'Promoted' = p_type starting with " +
        "'PROMO' (TPC-H's own predicate, evaluated on the broadcast " +
        "dim). 100 TB: the month predicate prunes at the scan; one " +
        "map-side-combined 1-row reduce.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
            && $"l_shipdate" < lit("1996-02-01").cast("timestamp"))
          .join(broadcast(Tables.t(s, dir, "part")),
            $"l_partkey" === $"p_partkey")
          .agg(
            sum(when($"p_type".startsWith("PROMO"),
              expr("cast(round(l_extendedprice * (1 - l_discount) " +
                "* 100) as bigint)")).otherwise(0L))
              .as("promo_cents"),
            sum(expr("cast(round(l_extendedprice * (1 - l_discount) " +
              "* 100) as bigint)")).as("total_cents"),
            count(lit(1)).as("n_items"))
          .select($"promo_cents", $"total_cents", $"n_items",
            expr("promo_cents * 1000000 div total_cents")
              .as("promo_share_ppm"))
      },
      Some("""
        SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(round(l_extendedprice * (1 - l_discount)
                   * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS promo_cents,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                 * 100) AS BIGINT)) AS BIGINT) AS total_cents,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(round(l_extendedprice * (1 - l_discount)
                   * 100) AS BIGINT) ELSE 0 END) * 1000000
                 // sum(CAST(round(l_extendedprice * (1 - l_discount)
                   * 100) AS BIGINT)) AS BIGINT) AS promo_share_ppm
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-02-01'""")),

    Q(
      "q382_disjunctive_predicates",
      "DISCOUNTED REVENUE UNDER OR-OF-ANDS PREDICATES (the TPC-H Q19 " +
        "shape — the classic disjunction that defeats naive predicate " +
        "pushdown: each branch constrains BOTH sides of the join, so " +
        "no single-table residual prunes the scan): three (brand, " +
        "size-band, quantity-band) branches evaluated as ONE filter " +
        "over the broadcast part join, each row tagged with its " +
        "matching branch so the output is the per-branch revenue " +
        "breakdown Q19's single scalar hides. Branch predicates are " +
        "mutually exclusive by brand, so the tag is well-defined and " +
        "the branch totals sum to Q19's answer. Revenue in exact " +
        "integer cents. 100 TB: part broadcasts; Catalyst pushes the " +
        "derived quantity-range superset (1 <= qty <= 30) to the " +
        "lineitem scan even though the full disjunction cannot go " +
        "below the join — the constraint-propagation win this query " +
        "exists to pin.",
      (s, dir) => {
        import s.implicits._
        val branch = when($"p_brand" === "Brand#11" &&
            $"p_size".between(1, 5) && $"l_quantity".between(1, 11),
            "brand11_small")
          .when($"p_brand" === "Brand#22" &&
            $"p_size".between(1, 10) && $"l_quantity".between(10, 20),
            "brand22_mid")
          .when($"p_brand" === "Brand#33" &&
            $"p_size".between(1, 15) && $"l_quantity".between(20, 30),
            "brand33_large")
        Tables.t(s, dir, "lineitem")
          .join(broadcast(Tables.t(s, dir, "part")),
            $"l_partkey" === $"p_partkey")
          .withColumn("branch", branch)
          .filter($"branch".isNotNull)
          .groupBy($"branch")
          .agg(count(lit(1)).as("n_items"),
            sum(expr("cast(round(l_extendedprice * (1 - l_discount) " +
              "* 100) as bigint)")).as("revenue_cents"))
          .orderBy($"branch")
      },
      Some("""
        WITH tagged AS (
          SELECT CASE
                   WHEN p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
                        AND l_quantity BETWEEN 1 AND 11
                   THEN 'brand11_small'
                   WHEN p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
                        AND l_quantity BETWEEN 10 AND 20
                   THEN 'brand22_mid'
                   WHEN p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 15
                        AND l_quantity BETWEEN 20 AND 30
                   THEN 'brand33_large'
                 END AS branch,
                 CAST(round(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT) AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT branch, CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM tagged WHERE branch IS NOT NULL
        GROUP BY branch ORDER BY branch""")),

    Q(
      "q384_min_cost_supplier",
      "MIN-COST SUPPLIER PER PART (the TPC-H Q2 shape — the correlated " +
        "MIN-equality subquery over a dimension star: 'the supplier " +
        "whose cost IS the minimum cost for that part, among AFRICA " +
        "suppliers'; completes the decorrelation family beside q342's " +
        "Q17 scalar-avg and q343's Q21 multi-EXISTS). The fixture has " +
        "no partsupp, so the offer book derives from lineitem itself: " +
        "a supplier's offer for a part = its cheapest observed unit " +
        "price, integer MICROS per unit via one truncating division " +
        "(cents*10000 div qty — DuckDB // truncates identically, so " +
        "the non-divisible 5%% of rows cannot drift cross-engine). " +
        "Spark-first decorrelation: the correlated 'WHERE cost = " +
        "(SELECT min(cost) ... same part)' becomes ONE window min " +
        "over the partkey partition of the region-filtered offer " +
        "frame + an equality filter — offers are scanned once, zero " +
        "rejoin (the agg-then-join-back form scans twice). Supplier x " +
        "nation x region collapses to a broadcast before the fact " +
        "scan, so lineitem is pruned to the region's ~1/5 BEFORE its " +
        "one partkey exchange. Ties (two suppliers at the same min " +
        "micros) are ALL kept, Q2's semantics; output is Q2's: top " +
        "100 by supplier balance with name tie-breaks.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sup = broadcast(Tables.t(s, dir, "supplier")
          .join(Tables.t(s, dir, "nation"),
            $"s_nationkey" === $"n_nationkey")
          .join(Tables.t(s, dir, "region"),
            $"n_regionkey" === $"r_regionkey")
          .filter($"r_name" === "AFRICA")
          .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name"))
        // supplier attributes ride THROUGH the offer aggregate (they are
        // functionally dependent on s_suppkey, so the group grain is
        // unchanged) — re-joining sup for names after the window would
        // scan the dim star twice: broadcast-exchange reuse cannot fire
        // because the two uses prune different columns (PlanSpec pins
        // the 5-scan shape)
        val offers = Tables.t(s, dir, "lineitem")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .select($"l_partkey", $"s_suppkey", $"s_name", $"s_acctbal",
            $"n_name",
            expr("cast(round(l_extendedprice * 100) as bigint) " +
              "* 10000 div cast(l_quantity as bigint)")
              .as("unit_micros"))
          .groupBy($"l_partkey", $"s_suppkey", $"s_name", $"s_acctbal",
            $"n_name")
          .agg(min($"unit_micros").as("offer_micros"))
        val best = offers
          .withColumn("min_micros", min($"offer_micros").over(
            Window.partitionBy($"l_partkey")))
          .filter($"offer_micros" === $"min_micros")
        best
          .join(broadcast(Tables.t(s, dir, "part")
              .filter($"p_size" <= 25)
              .select($"p_partkey", $"p_type")),
            $"l_partkey" === $"p_partkey")
          .select(
            expr("cast(round(s_acctbal * 100) as bigint)")
              .as("s_bal_cents"),
            $"s_name", $"n_name",
            $"p_partkey".cast("long").as("p_partkey"),
            $"p_type", $"offer_micros")
          .orderBy($"s_bal_cents".desc, $"n_name", $"s_name",
            $"p_partkey")
          .limit(100)
      },
      Some("""
        WITH sup AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'AFRICA'),
        offers AS (
          SELECT l_partkey, s_suppkey,
                 min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                   * 10000 // CAST(l_quantity AS BIGINT))
                   AS offer_micros
          FROM lineitem JOIN sup ON l_suppkey = s_suppkey
          GROUP BY 1, 2),
        best AS (
          SELECT l_partkey, s_suppkey, offer_micros FROM (
            SELECT l_partkey, s_suppkey, offer_micros,
                   min(offer_micros) OVER (PARTITION BY l_partkey) AS mn
            FROM offers)
          WHERE offer_micros = mn)
        SELECT CAST(round(s_acctbal * 100, 0) AS BIGINT)
                 AS s_bal_cents,
               s_name, n_name,
               CAST(p_partkey AS BIGINT) AS p_partkey,
               p_type, offer_micros
        FROM best
        JOIN sup USING (s_suppkey)
        JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 25
        ORDER BY s_bal_cents DESC, n_name, s_name, p_partkey
        LIMIT 100""")),

    Q(
      "q385_large_volume_customers",
      "LARGE-VOLUME CUSTOMERS (the TPC-H Q18 shape — IN over a grouped " +
        "HAVING: 'orders whose total quantity across all their " +
        "lineitems exceeds 200', then the customer behind each; the " +
        "last missing classic decorrelation pattern beside q342/q343/" +
        "q344/q384). Spark-first: the IN-subquery is a SEMI-JOIN " +
        "against the HAVING-filtered orderkey aggregate — but because " +
        "Q18 also SELECTS the subquery's sum, the semi-join collapses " +
        "into a plain inner join on the aggregated frame (one " +
        "lineitem scan, one orderkey exchange shared by the aggregate " +
        "and the join — Catalyst reuses the partitioning, no second " +
        "shuffle). Customer attaches by broadcast at fixture dims / " +
        "shuffle at scale. Quantities are exact BIGINTs, order value " +
        "exact cents; output is Q18's top-100 by (totalprice desc, " +
        "orderdate) with orderkey as the deterministic final " +
        "tie-break.",
      (s, dir) => {
        import s.implicits._
        val big = Tables.t(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(sum($"l_quantity".cast("long")).as("total_qty"))
          .filter($"total_qty" > 200L)
        Tables.t(s, dir, "orders")
          .join(big, $"o_orderkey" === $"l_orderkey")
          .join(broadcast(Tables.t(s, dir, "customer")),
            $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey".cast("long").as("c_custkey"),
            $"o_orderkey".cast("long").as("o_orderkey"),
            $"o_orderdate",
            expr("cast(round(o_totalprice * 100) as bigint)")
              .as("o_total_cents"),
            $"total_qty")
          .orderBy($"o_total_cents".desc, $"o_orderdate", $"o_orderkey")
          .limit(100)
      },
      Some("""
        WITH big AS (
          SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT))
                   AS BIGINT) AS total_qty
          FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200)
        SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
               CAST(round(o_totalprice * 100, 0) AS BIGINT)
                 AS o_total_cents,
               total_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_total_cents DESC, o_orderdate, o_orderkey
        LIMIT 100""")),

    Q(
      "q386_priority_late_orders",
      "ORDER PRIORITY CHECKING (the TPC-H Q4 shape — EXISTS with a " +
        "correlated NON-equi conjunct: orders in 1995Q1 having at " +
        "least one lineitem shipped more than 90 days after the " +
        "order date, counted per priority class; the fixture has no " +
        "commit/receipt dates, so lateness is ship-vs-order + 90d). " +
        "Spark-first: the EXISTS is a LEFT SEMI join whose condition " +
        "mixes the orderkey equi-key with the correlated date " +
        "comparison — Catalyst hashes on the equi part and evaluates " +
        "the date predicate as the join residual, so no row explodes " +
        "into a theta join and each order emits at most once no " +
        "matter how many late lineitems it has (the COUNT would " +
        "silently multiply under the naive inner-join rewrite). The " +
        "quarter filter pushes to the orders scan. 100 TB: one " +
        "orderkey exchange; the 5-row result is a bounded-domain " +
        "aggregate.",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
          .filter($"o_orderdate" >=
            lit("1995-01-01 00:00:00").cast("timestamp") &&
            $"o_orderdate" < lit("1995-04-01 00:00:00").cast("timestamp"))
        val l = Tables.t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_shipdate")
        o.join(l, $"l_orderkey" === $"o_orderkey" &&
            $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    Q(
      "q387_market_share",
      "NATIONAL MARKET SHARE (the TPC-H Q8 shape — a two-branch " +
        "conditional aggregate over a 6-table star: of all revenue " +
        "sold to REGION-1 customers, what share came from NATION_1 " +
        "suppliers, per order year). Spark-first: customer x nation " +
        "(region filter) and supplier x nation both collapse to " +
        "broadcasts BEFORE the one lineitem-orders exchange — the " +
        "customer-side broadcast prunes orders ~1/5 ahead of the " +
        "wire, the supplier side just tags rows; numerator and " +
        "denominator are branches of ONE aggregate (no second scan, " +
        "no self-join), share in exact cross-multiplied ppm. The " +
        "year domain is bounded, so the final frame is O(years).",
      (s, dir) => {
        import s.implicits._
        val cust = broadcast(Tables.t(s, dir, "customer")
          .join(Tables.t(s, dir, "nation"),
            $"c_nationkey" === $"n_nationkey")
          .filter($"n_regionkey" === 1)
          .select($"c_custkey"))
        val sup = broadcast(Tables.t(s, dir, "supplier")
          .join(Tables.t(s, dir, "nation"),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("supp_nation")))
        Tables.t(s, dir, "orders")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(Tables.t(s, dir, "lineitem"),
            $"o_orderkey" === $"l_orderkey")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .select(year($"o_orderdate").cast("long").as("o_year"),
            expr("cast(round(l_extendedprice * (1 - l_discount) * 100) " +
              "as bigint)").as("cents"),
            ($"supp_nation" === "NATION_1").as("is_target"))
          .groupBy($"o_year")
          .agg(sum($"cents").as("total_cents"),
            sum(when($"is_target", $"cents").otherwise(0L))
              .as("nation1_cents"))
          .withColumn("share_ppm",
            expr("nation1_cents * 1000000 div nullif(total_cents, 0)"))
          .orderBy($"o_year")
      },
      Some("""
        WITH f AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(round(l_extendedprice * (1 - l_discount) * 100)
                   AS BIGINT) AS cents,
                 sn.n_name = 'NATION_1' AS is_target
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          WHERE cn.n_regionkey = 1)
        SELECT o_year, CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(CASE WHEN is_target THEN cents ELSE 0 END)
                 AS BIGINT) AS nation1_cents,
               CAST(sum(CASE WHEN is_target THEN cents ELSE 0 END)
                 * 1000000 // nullif(sum(cents), 0) AS BIGINT)
                 AS share_ppm
        FROM f GROUP BY o_year ORDER BY o_year""")),

    Q(
      "q388_customer_distribution",
      "CUSTOMER ORDER-COUNT DISTRIBUTION (the TPC-H Q13 shape — the " +
        "counts-of-counts histogram over a LEFT join, the one classic " +
        "where customers with ZERO orders must survive into the " +
        "distribution): per customer, the count of non-URGENT orders " +
        "(LEFT join + count of the non-null key keeps the zeros), " +
        "then the histogram of those counts. Spark-first: one " +
        "custkey exchange for the per-customer count, then the " +
        "second aggregate is over the bounded count domain (tens of " +
        "values at any scale — a customer places boundedly many " +
        "orders) so it collapses map-side. Ordering custdist DESC " +
        "then c_count DESC is the classic output, a total order.",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
          .filter($"o_orderpriority" =!= "1-URGENT")
          .select($"o_custkey", $"o_orderkey")
        Tables.t(s, dir, "customer")
          .join(o, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""
        WITH cc AS (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM cc GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    Q(
      "q389_parts_supplier_counts",
      "PARTS/SUPPLIER RELATIONSHIP COUNTS (the TPC-H Q16 shape — " +
        "COUNT DISTINCT over an exclusion NOT-IN subquery: how many " +
        "distinct suppliers serve each (brand, size) part group, " +
        "excluding 'complaint' suppliers — negative account balance " +
        "here): the supplier-part universe is the distinct lineitem " +
        "pair set (no partsupp in the fixture). Spark-first: NOT IN " +
        "on a provably non-null key plans as a LEFT ANTI broadcast " +
        "join (the null-aware-anti trap never fires because the " +
        "exclusion side is filtered non-null by construction); the " +
        "distinct-pair frame shuffles once on partkey via the join " +
        "with part, and countDistinct over (brand, size) groups " +
        "runs on the deduped pairs. Top-40 by count with full " +
        "key tie-break keeps the limit deterministic.",
      (s, dir) => {
        import s.implicits._
        val pairs = Tables.t(s, dir, "lineitem")
          .select($"l_partkey", $"l_suppkey").distinct()
        val bad = Tables.t(s, dir, "supplier")
          .filter($"s_acctbal" < 0).select($"s_suppkey")
        pairs
          .join(broadcast(bad), $"l_suppkey" === $"s_suppkey",
            "left_anti")
          .join(broadcast(Tables.t(s, dir, "part")
            .select($"p_partkey", $"p_brand", $"p_size")),
            $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand", $"p_size".cast("long").as("p_size"))
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_size")
          .limit(40)
      },
      Some("""
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        kept AS (
          SELECT l_partkey, l_suppkey FROM pairs
          WHERE l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM kept JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
        LIMIT 40""")),

    Q(
      "q390_dominant_supplier",
      "DOMINANT-SUPPLIER DETECTION (the TPC-H Q20 shape — the " +
        "correlated FRACTION-OF-SUM inequality: suppliers shipping " +
        "more than 1/8 of a part's total shipped quantity, among " +
        "parts with more than one supplier; Q20's 'half the stock' " +
        "threshold is 1/8 here so the uniform fixture populates the " +
        "answer at every sf). Spark-first: the correlated scalar " +
        "('total qty for THIS part') is a window sum over the " +
        "partkey partition of the (part, supplier) aggregate — one " +
        "exchange, zero rejoin, the q342/q384 discipline; the " +
        "comparison q*8 > total is cross-multiplied exact. Output: " +
        "per surviving supplier, how many parts they dominate and " +
        "the dominated quantity, top-25 by dominance.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sq = Tables.t(s, dir, "lineitem")
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(sum($"l_quantity".cast("long")).as("q"))
        val w = Window.partitionBy($"l_partkey")
        sq.withColumn("t", sum($"q").over(w))
          .withColumn("ns", count(lit(1)).over(w))
          .filter($"q" * 8L > $"t" && $"ns" > 1L)
          .groupBy($"l_suppkey")
          .agg(count(lit(1)).as("n_dominated_parts"),
            sum($"q").as("dominated_qty"))
          .join(broadcast(Tables.t(s, dir, "supplier")),
            $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey".cast("long").as("s_suppkey"), $"s_name",
            $"n_dominated_parts", $"dominated_qty")
          .orderBy($"n_dominated_parts".desc, $"s_suppkey")
          .limit(25)
      },
      Some("""
        WITH sq AS (
          SELECT l_partkey, l_suppkey,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          FROM lineitem GROUP BY 1, 2),
        tot AS (
          SELECT l_partkey, sum(q) AS t, count(*) AS ns
          FROM sq GROUP BY 1),
        dom AS (
          SELECT l_suppkey, CAST(count(*) AS BIGINT)
                   AS n_dominated_parts,
                 CAST(sum(q) AS BIGINT) AS dominated_qty
          FROM sq JOIN tot USING (l_partkey)
          WHERE q * 8 > t AND ns > 1
          GROUP BY 1)
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
               n_dominated_parts, dominated_qty
        FROM dom JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY n_dominated_parts DESC, s_suppkey
        LIMIT 25""")),

    Q(
      "q391_important_parts",
      "IMPORTANT PART VALUES (the TPC-H Q11 shape — a grouped " +
        "aggregate filtered against a FRACTION OF THE GLOBAL " +
        "aggregate: parts whose REGION-0-supplied revenue exceeds " +
        "2x the average part's, i.e. value * n_parts > 2 * total — " +
        "scale-FREE where Q11's 0.0001/SF literal is famously " +
        "scale-dependent). Spark-first: the global scalar subquery " +
        "is a 1-row broadcast crossJoin onto the per-part frame " +
        "(computed from the SAME aggregate, one lineitem scan " +
        "total); the comparison is cross-multiplied exact integers, " +
        "so no floating threshold can flip a boundary part. " +
        "Supplier x nation collapses to a broadcast that prunes " +
        "lineitem to the region's ~1/5 before its one partkey " +
        "exchange.",
      (s, dir) => {
        import s.implicits._
        val sup = broadcast(Tables.t(s, dir, "supplier")
          .join(Tables.t(s, dir, "nation"),
            $"s_nationkey" === $"n_nationkey")
          .filter($"n_regionkey" === 0)
          .select($"s_suppkey"))
        val v = Tables.t(s, dir, "lineitem")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .groupBy($"l_partkey")
          .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
            " * 100) as bigint)")).as("val_cents"))
        val g = broadcast(v.agg(sum($"val_cents").as("tot"),
          count(lit(1)).as("np")))
        v.crossJoin(g)
          .filter($"val_cents" * $"np" > $"tot" * 2L)
          .select($"l_partkey".cast("long").as("l_partkey"),
            $"val_cents",
            expr("val_cents * np div tot").as("x_mean"))
          .orderBy($"val_cents".desc, $"l_partkey")
      },
      Some("""
        WITH v AS (
          SELECT l_partkey,
                 CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                   * 100) AS BIGINT)) AS BIGINT) AS val_cents
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_regionkey = 0
          GROUP BY 1),
        g AS (SELECT CAST(sum(val_cents) AS BIGINT) AS tot,
                     CAST(count(*) AS BIGINT) AS np FROM v)
        SELECT CAST(l_partkey AS BIGINT) AS l_partkey, val_cents,
               CAST(val_cents * np // tot AS BIGINT) AS x_mean
        FROM v, g
        WHERE val_cents * np > tot * 2
        ORDER BY val_cents DESC, l_partkey""")),

    Q(
      "q404_forecast_revenue_change",
      "FORECASTING REVENUE CHANGE (the TPC-H Q6 shape — the pure " +
        "scan-side query: no join at all, every predicate single-" +
        "column and scan-pushable; with q405 this completes ALL 22 " +
        "classic TPC-H shapes in the corpus): revenue that WOULD have " +
        "been gained by eliminating small discounts — sum of " +
        "l_extendedprice * l_discount over one ship-year, a discount " +
        "band, and a quantity cap, in exact integer cents (per-row " +
        "round like q357). The PLAN is the point at 100 TB: " +
        "`.explain` shows all three predicates in PushedFilters on " +
        "the parquet scan and a 2-column ReadSchema beside the " +
        "filter columns — the scan reads a fraction of the table and " +
        "the aggregate is one map-side-combined 1-row reduce; no " +
        "exchange carries more than 32 partial rows. Discount bounds " +
        "compare the same parquet doubles both engines read, so the " +
        "band is bit-identical cross-engine (fixture discounts are " +
        "exact hundredths).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp")
            && $"l_shipdate" < lit("1998-01-01").cast("timestamp")
            && $"l_discount".between(0.05, 0.07)
            && $"l_quantity" < 24.0)
          .agg(sum(expr("cast(round(l_extendedprice * l_discount " +
            "* 100) as bigint)")).as("lost_revenue_cents"),
            count(lit(1)).as("n_items"))
      },
      Some("""
        SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100)
                 AS BIGINT)) AS BIGINT) AS lost_revenue_cents,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")),

    Q(
      "q405_product_type_profit",
      "PRODUCT-TYPE PROFIT BY NATION AND YEAR (the TPC-H Q9 shape — " +
        "the widest classic join tree: a name-filtered part dim fans " +
        "lineitem to supplier→nation on one side and orders on the " +
        "other, profit aggregated by (nation, order-year); the last " +
        "of the 22 TPC-H shapes). The fixture has no partsupp, so " +
        "supply cost derives from the part dim itself (q384's " +
        "precedent): cost-per-unit = 60% of retail price in integer " +
        "cents via one truncating division (round(p_retailprice*100) " +
        "* 3 div 5 — DuckDB // truncates identically), and profit = " +
        "revenue_cents - cost_per_unit * quantity, all BIGINT so " +
        "nothing can drift. Plan: part (name-filtered, ~1/6 of the " +
        "dim) and supplier⋈nation BROADCAST — lineitem is pruned by " +
        "the part semi-side BEFORE the one unavoidable fact-fact " +
        "exchange with orders on orderkey; the final aggregate is " +
        "bounded by nations x years. 100 TB: one fact shuffle, " +
        "everything else map-side.",
      (s, dir) => {
        import s.implicits._
        val p = Tables.t(s, dir, "part")
          .filter($"p_name".contains("widget"))
          .select($"p_partkey",
            expr("cast(round(p_retailprice * 100) as bigint) * 3 div 5")
              .as("cost_per_unit_cents"))
        val sn = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("nation"))
        Tables.t(s, dir, "lineitem")
          .join(broadcast(p), $"l_partkey" === $"p_partkey")
          .join(broadcast(sn), $"l_suppkey" === $"s_suppkey")
          .join(Tables.t(s, dir, "orders"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"nation",
            year($"o_orderdate").cast("long").as("o_year"))
          .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
              " * 100) as bigint) - cost_per_unit_cents * " +
              "cast(l_quantity as bigint)")).as("profit_cents"),
            count(lit(1)).as("n_items"))
          .orderBy($"nation", $"o_year".desc)
      },
      Some("""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                 * 100) AS BIGINT)
                 - (CAST(round(p_retailprice * 100) AS BIGINT) * 3 // 5)
                   * CAST(l_quantity AS BIGINT)) AS BIGINT)
                 AS profit_cents,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC"""))
  )
}
