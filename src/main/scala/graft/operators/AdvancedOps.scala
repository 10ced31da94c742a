package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-ring capability surface: statistical aggregates, order
  * statistics, string aggregation, analytic windows beyond rank, null-safe
  * comparison, by-name set ops, and the salted-aggregation skew pattern.
  */
object AdvancedOps extends QueryModule {

  override def queries: Seq[Q] = Seq(
    Q(
      "q456_scaling_cpu_probe",
      "EMBARRASSINGLY PARALLEL CPU PROBE — the bench's core-count " +
        "contract made self-evident (the r15 scaling block could not " +
        "adjudicate whether the low-core run honored " +
        "$SPARK_GRAFT_CPUS because every measured query was driver/" +
        "metadata-bound at sf0.1): a fixed per-input-row budget of " +
        "codegen'd xxhash64 chains over a 64-split range — no I/O " +
        "after one tiny input aggregate, no shuffle, no driver work — " +
        "so wall time is work/cores and an 8-vs-32-core bench pair " +
        "MUST separate by ~4x when the env is honored. The chain seed " +
        "folds in the input's max key, so the output derives from the " +
        "parquet input and the per-row budget scales the probe with " +
        "the scale factor like every real query. Deterministic " +
        "(count, max-hash, checksum) row; rows-only (DuckDB has no " +
        "xxhash64 twin).",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
        val r = o.agg(count(lit(1)), max($"o_orderkey")).head()
        val (nOrders, mx) = (r.getLong(0), r.getLong(1))
        // 12800 hash-chain steps of length 8 per order row: ~15G
        // hashes at sf0.1 — ~4-5 s of pure parallel CPU at 32 cores,
        // ~4x that at 8, sized so the probe lands in the bench's
        // top-20 map at BOTH core counts (the driver computes scaling
        // ratios from the top-20 artifact lines only). Fixed
        // constants; work scales with SF via the row count.
        val n = nOrders * 12800L
        def chain(c: org.apache.spark.sql.Column, k: Int)
            : org.apache.spark.sql.Column =
          if (k == 0) c else chain(xxhash64(c), k - 1)
        s.range(0L, n, 1L, 64)
          .select(chain($"id" + lit(mx), 8).as("h"))
          .agg(count(lit(1)).as("n_rows"), max($"h").as("max_h"),
            sum(pmod($"h", lit(1000000L))).as("checksum"))
          // the filter makes the checksum LOAD-BEARING under the
          // bench's `.count()` action — without it column pruning
          // deletes the hash chains and the probe measures nothing
          // (guide §1.4's count() trap, measured: 0.16 s instead of
          // seconds). Checksum is a sum of pmods, never negative.
          .where($"checksum" >= 0L)
      },
      None),

    Q(
      "q43_stats_aggs",
      "Statistical aggregates: stddev/variance (sample), correlation and " +
        "covariance between price and discount.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
            round(var_samp($"l_quantity"), 4).as("var_qty"),
            round(corr($"l_extendedprice", $"l_discount"), 6).as("corr_price_disc"),
            round(covar_samp($"l_extendedprice", $"l_discount"), 4).as("covar_price_disc"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 4)        AS sd_price,
               round(var_samp(l_quantity), 4)                AS var_qty,
               round(corr(l_extendedprice, l_discount), 6)   AS corr_price_disc,
               round(covar_samp(l_extendedprice, l_discount), 4) AS covar_price_disc
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    Q(
      "q44_order_statistics",
      "Exact order statistics: median + interpolated percentiles (p25/p90) " +
        "per group (Catalyst's exact percentile, DuckDB quantile_cont).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(
            round(median($"o_totalprice"), 4).as("med_price"),
            round(percentile($"o_totalprice", lit(0.25)), 4).as("p25_price"),
            round(percentile($"o_totalprice", lit(0.9)), 4).as("p90_price"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               round(median(o_totalprice), 4)              AS med_price,
               round(quantile_cont(o_totalprice, 0.25), 4) AS p25_price,
               round(quantile_cont(o_totalprice, 0.9), 4)  AS p90_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    Q(
      "q45_string_agg",
      "String aggregation: deterministic (sorted, distinct) concatenation " +
        "of group members — collect_set→array_sort→array_join, the " +
        "order-stable form of listagg.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(array_join(array_sort(collect_set($"o_orderstatus")), ",").as("statuses"),
            countDistinct($"o_orderstatus").as("n_statuses"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
               count(DISTINCT o_orderstatus) AS n_statuses
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    Q(
      "q46_window_distribution",
      "Distribution-analytic windows: percent_rank, cume_dist, nth_value " +
        "over per-nation account-balance ordering.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal", $"s_suppkey")
        Tables.t(s, dir, "supplier")
          .select(
            $"s_nationkey", $"s_suppkey",
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"),
            nth_value($"s_acctbal", 2).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_lowest"))
          .orderBy($"s_nationkey", $"s_suppkey")
      },
      Some("""
        SELECT s_nationkey, s_suppkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6)    AS cume,
               nth_value(s_acctbal, 2) OVER (PARTITION BY s_nationkey
                 ORDER BY s_acctbal, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_lowest
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        ORDER BY s_nationkey, s_suppkey""")),

    Q(
      "q47_nullsafe_equality",
      "Null-safe equality (<=> / IS NOT DISTINCT FROM) vs plain = over " +
        "columns with injected NULLs.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .select(
            nullif($"o_orderstatus", lit("O")).as("a"),
            nullif($"o_orderstatus", lit("F")).as("b"))
          .select(
            sum(when($"a" <=> $"b", 1L).otherwise(0L)).as("n_nullsafe_eq"),
            sum(when($"a" === $"b", 1L).otherwise(0L)).as("n_plain_eq"),
            sum(when($"a".isNull, 1L).otherwise(0L)).as("n_a_null"))
      },
      Some("""
        SELECT CAST(sum(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nullsafe_eq,
               CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq,
               CAST(sum(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_a_null
        FROM (SELECT nullif(o_orderstatus, 'O') AS a, nullif(o_orderstatus, 'F') AS b
              FROM orders)""")),

    Q(
      "q48_union_by_name",
      "unionByName (schema-aligned bag union across differently-ordered " +
        "projections) + intersectAll (bag intersection), re-aggregated.",
      (s, dir) => {
        import s.implicits._
        val a = Tables.t(s, dir, "customer")
          .select($"c_nationkey".as("nationkey"), lit("customer").as("side"))
        val b = Tables.t(s, dir, "supplier")
          .select(lit("supplier").as("side"), $"s_nationkey".as("nationkey"))
        a.unionByName(b)
          .groupBy($"nationkey", $"side").agg(count(lit(1)).as("n"))
          .orderBy($"nationkey", $"side")
      },
      Some("""
        SELECT nationkey, side, count(*) AS n
        FROM (SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
              UNION ALL
              SELECT s_nationkey, 'supplier' FROM supplier)
        GROUP BY nationkey, side
        ORDER BY nationkey, side""")),

    Q(
      "q49_salted_agg",
      "Salted two-phase aggregation — the hot-key skew pattern: phase 1 " +
        "groups by (key, salt=hash%16) so one hot key spreads over 16 " +
        "reducers, phase 2 merges partials by key. Semantically transparent " +
        "(oracle is the plain GROUP BY), which is exactly the point.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .withColumn("salt", pmod(xxhash64($"l_orderkey"), lit(16)))
          .groupBy($"l_returnflag", $"salt")
          .agg(sum($"l_quantity").as("part_qty"), count(lit(1)).as("part_n"))
          .groupBy($"l_returnflag")
          .agg(round(sum($"part_qty"), 2).as("total_qty"), sum($"part_n").as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""
        SELECT l_returnflag, round(sum(l_quantity), 2) AS total_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    Q(
      "q55_edit_distance",
      "Levenshtein edit distance of each document's head against a fixed " +
        "probe phrase — the character-level near-dup metric (built-in " +
        "codegen'd expression).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(
            $"doc_id",
            levenshtein(substring($"text", 1, 24), lit("the fast key order sort")).as("edit_dist"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(levenshtein(substr(text, 1, 24), 'the fast key order sort') AS INTEGER)
                 AS edit_dist
        FROM documents
        ORDER BY doc_id""")),

    Q(
      "q103_unpivot",
      "Unpivot (melt): a wide per-status aggregate row turned into long " +
        "(status, metric, value) form via Dataset.unpivot — the inverse of " +
        "q25's pivot. The unpivot itself is a zero-shuffle generate over " +
        "an already-tiny aggregate; at scale the cost stays in the " +
        "upstream agg, which shuffles only partial sums per status.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            round(sum($"o_totalprice"), 2).as("total_price"),
            count(lit(1)).cast("double").as("n_orders"),
            max($"o_totalprice").as("max_price"))
          .unpivot(
            Array($"o_orderstatus"),
            Array($"total_price", $"n_orders", $"max_price"),
            "metric", "value")
          .orderBy($"o_orderstatus", $"metric")
      },
      Some("""
        WITH w AS (SELECT o_orderstatus,
                          round(sum(o_totalprice), 2)   AS total_price,
                          CAST(count(*) AS DOUBLE)      AS n_orders,
                          max(o_totalprice)             AS max_price
                   FROM orders GROUP BY 1)
        SELECT o_orderstatus, 'total_price' AS metric, total_price AS value FROM w
        UNION ALL
        SELECT o_orderstatus, 'n_orders', n_orders FROM w
        UNION ALL
        SELECT o_orderstatus, 'max_price', max_price FROM w
        ORDER BY o_orderstatus, metric""")),

    Q(
      "q134_cms_heavy_hitters",
      "Count-min-sketch HEAVY HITTERS — the bounded-memory alternative " +
        "to q105's exact top-k when the key space itself (full bigram " +
        "vocabulary at 100 TB) outgrows executor memory: Spark's " +
        "built-in `count_min_sketch` aggregate (codegen'd, map-side " +
        "mergeable, fixed depth x width state regardless of " +
        "cardinality) folds the corpus into one ~100 KB sketch; the " +
        "driver deserializes it (a sketch IS a driver artifact, like " +
        "the IVF codebook) and estimates the known top-10 bigrams — " +
        "output pairs each exact count with its estimate. CMS can only " +
        "OVERestimate (est >= exact, within eps*N at the configured " +
        "confidence) — asserted per row here and gated in " +
        "KernelPropertySpec. Rows-only: sketch internals are " +
        "engine-specific.",
      (s, dir) => {
        import s.implicits._
        val bigrams = Tables.t(s, dir, "documents")
          .select(split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
          .select(explode(expr(
            "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
            .as("bigram"))
        val skBytes = bigrams
          .agg(count_min_sketch($"bigram", lit(0.001), lit(0.99), lit(42)).as("sk"))
          .head().getAs[Array[Byte]](0)
        val cms = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(skBytes))
        val top = bigrams.groupBy($"bigram").agg(count(lit(1)).as("n_exact"))
          .orderBy($"n_exact".desc, $"bigram").limit(10)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        top.toSeq
          .map { case (b, n) =>
            val est = cms.estimateCount(b)
            (b, n, est, est >= n)
          }
          .toDF("bigram", "n_exact", "n_est", "overestimate_ok")
          .orderBy($"n_exact".desc, $"bigram")
      },
      None),

    Q(
      "q151_incremental_agg",
      "INCREMENTAL AGGREGATE MAINTENANCE (materialized-view merge): the " +
        "historical 90% of events (event_id % 10 != 0, q119's id-split " +
        "convention) is aggregated ONCE into mergeable per-user partials " +
        "(count, integer-cents sum, max) and PERSISTED to parquet — " +
        "written and reread here so the round-trip is real; the arriving " +
        "10% aggregates fresh, and the answer is the MERGE of the two " +
        "partial states (sum of counts/sums, max of maxes) — history is " +
        "never rescanned. This is how a 100 TB nightly metric survives " +
        "daily batches: the delta shuffle is 10% of a recompute, the MV " +
        "grows with distinct keys, not events. Bit-exact vs a full " +
        "recompute oracle BECAUSE the state is integer (floor cents): " +
        "float partials would drift by summation order; mergeable-exact " +
        "is a design property, not luck.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select($"event_id", $"user_id",
            floor($"value" * 100).cast("long").as("cents"))
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy($"user_id").agg(
            count(lit(1)).as("n"),
            sum($"cents").as("sum_cents"),
            max($"cents").as("max_cents"))
        val mvPath = graft.TempRoots.freshForDir("graft_mv", dir).toString
        partial(ev.filter($"event_id" % 10 =!= 0))
          .write.mode("overwrite").parquet(mvPath)
        val history = s.read.parquet(mvPath) // the persisted MV, reread
        val delta = partial(ev.filter($"event_id" % 10 === 0))
        history.unionByName(delta)
          .groupBy($"user_id")
          .agg(sum($"n").as("n_events"),
            sum($"sum_cents").as("sum_cents"),
            max($"max_cents").as("max_cents"))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
               CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
        FROM events
        GROUP BY user_id
        ORDER BY user_id""")),

    Q(
      "q220_data_contract",
      "DATA-CONTRACT VALIDATION (Deequ-style constraint suite — the " +
        "quality gate a pipeline runs BEFORE promoting an ingest batch, " +
        "where q154 profiles and q171 quarantines parse failures): six " +
        "declarative constraints over events — user_id completeness, " +
        "event_id uniqueness, event_type domain containment, value " +
        "range [0, 1000), ts inside the 2024 fixture epoch, and props " +
        "JSON carrying k in [0, 100) — each reported as (check_name, " +
        "n_checked, n_violations, passed). ALL constraints evaluate in " +
        "ONE pass: conditional sums share a single aggregate (map-side " +
        "partials; uniqueness rides the same pass as n - " +
        "count(DISTINCT event_id), Spark's expand keeps it two-phase), " +
        "and the wide 1-row result unpivots via stack() into the 6-row " +
        "report — at 100 TB the contract costs one scan regardless of " +
        "how many constraints it carries, which is the entire point of " +
        "declaring them together rather than running six audits.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .agg(
            count(lit(1)).as("n"),
            sum(when($"user_id".isNull, 1L).otherwise(0L)).as("v_comp"),
            (count(lit(1)) - countDistinct($"event_id")).as("v_uniq"),
            sum(when(!$"event_type".isin(
              "click", "view", "purchase", "signup", "error"), 1L)
              .otherwise(0L)).as("v_dom"),
            sum(when($"value" < 0 || $"value" >= 1000, 1L).otherwise(0L))
              .as("v_rng"),
            sum(when(year($"ts") =!= 2024, 1L).otherwise(0L)).as("v_ts"),
            sum(when(expr("cast(get_json_object(props, '$.k') as bigint)")
              .isNull ||
              !expr("cast(get_json_object(props, '$.k') as bigint)")
                .between(0, 99), 1L).otherwise(0L)).as("v_json"))
          .select($"n", expr(
            "stack(6, " +
              "'completeness_user_id', v_comp, " +
              "'uniqueness_event_id', v_uniq, " +
              "'domain_event_type', v_dom, " +
              "'range_value', v_rng, " +
              "'epoch_ts', v_ts, " +
              "'json_props_k', v_json) as (check_name, n_violations)"))
          .select($"check_name", $"n".as("n_checked"), $"n_violations",
            ($"n_violations" === 0L).as("passed"))
          .orderBy($"check_name")
      },
      Some("""
        WITH a AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_comp,
                 CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS v_uniq,
                 CAST(sum(CASE WHEN event_type NOT IN
                   ('click','view','purchase','signup','error')
                   THEN 1 ELSE 0 END) AS BIGINT) AS v_dom,
                 CAST(sum(CASE WHEN value < 0 OR value >= 1000
                   THEN 1 ELSE 0 END) AS BIGINT) AS v_rng,
                 CAST(sum(CASE WHEN year(ts) <> 2024
                   THEN 1 ELSE 0 END) AS BIGINT) AS v_ts,
                 CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, 'k') AS BIGINT)
                   IS NULL OR TRY_CAST(json_extract_string(props, 'k') AS BIGINT)
                   NOT BETWEEN 0 AND 99 THEN 1 ELSE 0 END) AS BIGINT) AS v_json
          FROM events),
        r AS (
          SELECT 'completeness_user_id' AS check_name, n AS n_checked,
                 v_comp AS n_violations FROM a
          UNION ALL SELECT 'uniqueness_event_id', n, v_uniq FROM a
          UNION ALL SELECT 'domain_event_type', n, v_dom FROM a
          UNION ALL SELECT 'range_value', n, v_rng FROM a
          UNION ALL SELECT 'epoch_ts', n, v_ts FROM a
          UNION ALL SELECT 'json_props_k', n, v_json FROM a)
        SELECT check_name, n_checked, n_violations,
               (n_violations = 0) AS passed
        FROM r ORDER BY check_name""")),

    Q(
      "q152_hll_sketch_merge",
      "MERGEABLE DISTINCT SKETCHES (Apache DataSketches HLL, built into " +
        "Spark 4): per-(lang, source) token sketches are built in one " +
        "pass, then UNIONED per lang and estimated — the count-distinct " +
        "analogue of q151's MV maintenance: per-shard sketches persist " +
        "(kilobytes each), daily deltas merge in without rescanning " +
        "history, and cross-cuts (per-lang here) come from unioning " +
        "shard sketches, never re-reading tokens. No SQL oracle (sketch " +
        "internals are engine-specific); the ScalaTest gate asserts " +
        "every estimate lands within HLL error of the exact distinct " +
        "count.",
      (s, dir) => {
        import s.implicits._
        val tok = Tables.t(s, dir, "documents")
          .select($"lang", $"source",
            explode(split(trim($"text"), " ")).as("w"))
          .filter($"w" =!= "")
        val shard = tok.groupBy($"lang", $"source")
          .agg(expr("hll_sketch_agg(w, 12)").as("sk"))
        shard.groupBy($"lang")
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct_tokens"),
            count(lit(1)).as("n_shards"))
          .orderBy($"lang")
      },
      None),

    Q(
      "q271_weighted_percentile",
      "WEIGHTED EXACT PERCENTILES — q168's counting-CDF generalized to " +
        "weighted mass: p50/p90/p99 of the lineitem unit price in whole " +
        "dollars, where each price carries its QUANTITY as weight (the " +
        "'typical price per unit sold' a merch dashboard wants, vs " +
        "q168's per-row percentile that would over-represent small " +
        "orders). Same two-phase shape: one row-scale aggregate onto " +
        "the dollar-price DOMAIN accumulating integer weight mass, a " +
        "running-sum window over that domain (values, never rows — " +
        "q168's argument), and the threshold rule cum*100 >= pct*W in " +
        "cross-multiplied integers. Weights are exact: quantity is " +
        "integral in the fixtures, carried as bigint. One shuffle " +
        "total; the percentile never sorts rows.",
      (s, dir) => {
        import s.implicits._
        val mass = Tables.t(s, dir, "lineitem")
          .select(expr("cast(round(l_extendedprice) as bigint)").as("dollars"),
            expr("cast(l_quantity as bigint)").as("w"))
          .groupBy($"dollars").agg(sum($"w").as("m"))
        val cum = mass.withColumn("cum",
          sum($"m").over(Window.orderBy($"dollars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tot = broadcast(mass.agg(sum($"m").as("wtot")))
        val ps = Seq(("p50", 50), ("p90", 90), ("p99", 99)).toDF("lbl", "pct")
        cum.crossJoin(tot).crossJoin(broadcast(ps))
          .filter($"cum" * 100 >= $"pct" * $"wtot")
          .groupBy($"lbl")
          .agg(min($"dollars").as("dollars"), min($"wtot").as("total_weight"))
          .orderBy($"lbl")
      },
      Some("""
        WITH mass AS (
          SELECT CAST(round(l_extendedprice) AS BIGINT) AS dollars,
                 CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS m
          FROM lineitem GROUP BY 1),
        cum AS (
          SELECT dollars, m,
                 CAST(sum(m) OVER (ORDER BY dollars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
          FROM mass),
        t AS (SELECT CAST(sum(m) AS BIGINT) AS wtot FROM mass),
        ps AS (SELECT * FROM (VALUES ('p50', 50), ('p90', 90), ('p99', 99))
               AS v(lbl, pct))
        SELECT lbl, CAST(min(dollars) AS BIGINT) AS dollars,
               CAST(min(wtot) AS BIGINT) AS total_weight
        FROM cum, t, ps
        WHERE cum * 100 >= pct * wtot
        GROUP BY lbl ORDER BY lbl""")),

    Q(
      "q316_skew_salt_planner",
      "JOIN-SKEW / SALT-FACTOR PLANNER — the measurement behind every " +
        "skew mitigation this repo applies (q49's salting recipe, the " +
        "AqeSkewSpec split): for each join key the schema actually " +
        "joins on, ONE count-by-key aggregate yields the skew " +
        "diagnosis — total rows, distinct keys, the hottest key's " +
        "row count and ppm share, the max/mean ratio in ppm (the " +
        "number AQE's skew threshold reasons about), and the " +
        "recommended salt factor ceil(max_key_rows / (rows / 32)) — " +
        "the smallest split of the hottest key that fits a 32-" +
        "partition shuffle's average partition (at 1000 executors, " +
        "substitute the real partition count; the formula is the " +
        "plan). salt = 1 means 'don't salt' — visible directly in " +
        "the audit, since salting un-skewed keys only doubles the " +
        "small side for nothing. Each audit is one aggregate with " +
        "map-side partials over the key domain; the hot key's count " +
        "itself cannot skew the audit because the first-level " +
        "groupBy collapses it map-side. All four audits union into " +
        "one 4-row table.",
      (s, dir) => {
        import s.implicits._
        // ONE lineitem scan audits all three of its keys: each row
        // explodes to (key_name, key_value) pairs — a 3x fan-out of
        // 16-byte rows collapsed map-side by the count-by-key right
        // behind it — instead of three full scans of the fact table
        val li = Tables.t(s, dir, "lineitem").select(explode(array(
            struct(lit("l_orderkey").as("join_key"),
              $"l_orderkey".cast("long").as("k")),
            struct(lit("l_partkey").as("join_key"),
              $"l_partkey".cast("long").as("k")),
            struct(lit("l_suppkey").as("join_key"),
              $"l_suppkey".cast("long").as("k")))).as("x"))
          .select(lit("lineitem").as("rel"),
            $"x.join_key".as("join_key"), $"x.k".as("k"))
        val od = Tables.t(s, dir, "orders")
          .select(lit("orders").as("rel"),
            lit("o_custkey").as("join_key"),
            $"o_custkey".cast("long").as("k"))
        li.unionAll(od)
          .groupBy($"rel", $"join_key", $"k").agg(count(lit(1)).as("c"))
          .groupBy($"rel", $"join_key")
          .agg(sum($"c").as("n_rows"), count(lit(1)).as("n_keys"),
            max($"c").as("max_key_rows"))
          .select($"rel", $"join_key",
            $"n_rows", $"n_keys", $"max_key_rows",
            expr("max_key_rows * 1000000 DIV n_rows")
              .as("top_share_ppm"),
            expr("max_key_rows * n_keys * 1000000 DIV n_rows")
              .as("max_over_mean_ppm"),
            greatest(lit(1L),
              expr("(max_key_rows * 32 + n_rows - 1) DIV n_rows"))
              .as("rec_salt"))
          .orderBy($"rel", $"join_key")
      },
      Some("""
        WITH a1 AS (SELECT l_orderkey AS k FROM lineitem),
        a2 AS (SELECT l_partkey AS k FROM lineitem),
        a3 AS (SELECT l_suppkey AS k FROM lineitem),
        a4 AS (SELECT o_custkey AS k FROM orders),
        u AS (
          SELECT 'lineitem' AS rel, 'l_orderkey' AS join_key, k FROM a1
          UNION ALL SELECT 'lineitem', 'l_partkey', k FROM a2
          UNION ALL SELECT 'lineitem', 'l_suppkey', k FROM a3
          UNION ALL SELECT 'orders', 'o_custkey', k FROM a4),
        g AS (SELECT rel, join_key, k, CAST(count(*) AS BIGINT) AS c
              FROM u GROUP BY 1, 2, 3),
        st AS (
          SELECT rel, join_key,
                 CAST(sum(c) AS BIGINT) AS n_rows,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(max(c) AS BIGINT) AS max_key_rows
          FROM g GROUP BY 1, 2)
        SELECT rel, join_key, n_rows, n_keys, max_key_rows,
               max_key_rows * 1000000 // n_rows AS top_share_ppm,
               max_key_rows * n_keys * 1000000 // n_rows
                 AS max_over_mean_ppm,
               greatest(1, (max_key_rows * 32 + n_rows - 1) // n_rows)
                 AS rec_salt
        FROM st ORDER BY rel, join_key""")),

    Q(
      "q349_benford_audit",
      "BENFORD'S-LAW FIRST-DIGIT AUDIT on order totals — the " +
        "forensic-accounting screen (Nigrini's fraud test; also a " +
        "data-quality smell test for synthetic or truncated feeds): " +
        "observed leading-digit distribution of o_totalprice vs the " +
        "Benford expectation P(d) = log10(1 + 1/d), with per-digit " +
        "absolute deviation. The expectations enter as ppm LITERALS " +
        "(301030, 176091, ... — q238's no-libm constant rule: never " +
        "engine log10), the leading digit is a string head of the " +
        "exact cents BIGINT (x100 preserves it), observed shares are " +
        "integer ppm, and the digit grid is DENSE (a digit with zero " +
        "orders still reports — its deviation IS the finding). The " +
        "fixture's bounded uniform prices genuinely fail Benford; " +
        "the audit exists to QUANTIFY that per digit. Plan: one " +
        "orders scan -> 9-row digit aggregate, expectations attach " +
        "by broadcast right join on the 9-row literal frame, total " +
        "is a 1-row broadcast. 100 TB: one map-side-combined " +
        "aggregate; everything after lives on 9 rows.",
      (s, dir) => {
        import s.implicits._
        val benford = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
          4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
          8 -> 51153L, 9 -> 45757L)
        val exp = broadcast(benford.toDF("digit", "expected_ppm")
          .select($"digit".cast("long").as("digit"), $"expected_ppm"))
        val obs = Tables.t(s, dir, "orders")
          .select(substring(round($"o_totalprice" * 100).cast("long")
            .cast("string"), 1, 1).cast("long").as("digit"))
          .groupBy($"digit").agg(count(lit(1)).as("n_orders"))
        val tot = broadcast(Tables.t(s, dir, "orders")
          .agg(count(lit(1)).as("n_total")))
        exp.join(obs, Seq("digit"), "left")
          .withColumn("n_orders", coalesce($"n_orders", lit(0L)))
          .crossJoin(tot)
          .select($"digit", $"n_orders",
            expr("n_orders * 1000000 div n_total").as("observed_ppm"),
            $"expected_ppm")
          .withColumn("abs_dev_ppm",
            abs($"observed_ppm" - $"expected_ppm"))
          .orderBy($"digit")
      },
      Some("""
        WITH exp AS (
          SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
            (4, 96910), (5, 79181), (6, 66947), (7, 57992),
            (8, 51153), (9, 45757)) AS t(digit, expected_ppm)),
        obs AS (
          SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)
                   AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM orders)
        SELECT CAST(exp.digit AS BIGINT) AS digit,
               CAST(coalesce(obs.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(coalesce(obs.n_orders, 0) * 1000000 // n_total
                 AS BIGINT) AS observed_ppm,
               CAST(exp.expected_ppm AS BIGINT) AS expected_ppm,
               CAST(abs(coalesce(obs.n_orders, 0) * 1000000 // n_total
                 - exp.expected_ppm) AS BIGINT) AS abs_dev_ppm
        FROM exp LEFT JOIN obs ON exp.digit = obs.digit
        CROSS JOIN tot
        ORDER BY digit""")),

    Q(
      "q362_merkle_reconcile",
      "MERKLE-STYLE TABLE RECONCILIATION (the anti-entropy audit of " +
        "Dynamo/Cassandra repair, DataFrame-native): two replicas of " +
        "orders — the original and a drifted twin missing every " +
        "orderkey % 997 == 0 row and carrying one corrupted total — " +
        "are compared WITHOUT a full-table diff: each row folds to a " +
        "portable integer row-hash (Knuth multiplicative mix of key " +
        "and cents, q361's engine-portable convention), rows bucket " +
        "by key % 64, and each bucket reduces to an order-independent " +
        "SUM digest. Only buckets whose digests differ are drilled " +
        "into with the expensive row-level anti-join — the audit " +
        "emits the economics: 64 bucket digests moved vs rows " +
        "re-scanned in diverging buckets vs actual divergent rows. " +
        "100 TB: phase 1 is one map-side-combined 64-row aggregate " +
        "per replica (digests are KILOBYTES on the wire — this is " +
        "how you reconcile replicas across datacenters); phase 2 " +
        "touches only the diverging buckets' partitions.",
      (s, dir) => {
        import s.implicits._
        def hashed(df: org.apache.spark.sql.DataFrame) = df
          .select($"o_orderkey".as("k"),
            expr("cast(round(o_totalprice * 100) as bigint)")
              .as("cents"))
          .select($"k", ($"k" % 64).as("bucket"),
            (($"k" * 2654435761L + $"cents" * 40503L) % 1000000007L)
              .as("rh"))
        val a = hashed(Tables.t(s, dir, "orders"))
        // drifted replica: drop every 997th key, corrupt one row
        val b = hashed(Tables.t(s, dir, "orders")
            .filter($"o_orderkey" % 997 =!= 0)
            .withColumn("o_totalprice",
              when($"o_orderkey" === 7L, $"o_totalprice" + 1.0)
                .otherwise($"o_totalprice")))
        val da = a.groupBy($"bucket")
          .agg(sum($"rh").as("dig_a"), count(lit(1)).as("rows_a"))
        val db = b.groupBy($"bucket")
          .agg(sum($"rh").as("dig_b"), count(lit(1)).as("rows_b"))
        val cmp = da.join(db, Seq("bucket"), "full")
          .select($"bucket",
            (coalesce($"dig_a", lit(0L)) =!=
              coalesce($"dig_b", lit(0L))).as("diverged"),
            coalesce($"rows_a", lit(0L)).as("rows_a"),
            coalesce($"rows_b", lit(0L)).as("rows_b"))
        val divb = cmp.filter($"diverged")
          .select($"bucket".as("dbucket"), $"rows_a")
        // drill down ONLY into diverging buckets
        val aDrill = a.join(broadcast(divb),
          $"bucket" === $"dbucket", "left_semi")
        val bDrill = b.join(broadcast(divb),
          $"bucket" === $"dbucket", "left_semi")
        val divergent = aDrill.select($"k", $"rh")
          .exceptAll(bDrill.select($"k", $"rh"))
        val s1 = broadcast(cmp.agg(
          count(lit(1)).as("n_buckets"),
          sum($"diverged".cast("long")).as("diverged_buckets"),
          sum($"rows_a").as("rows_total")))
        val s2 = broadcast(divb.agg(
          coalesce(sum($"rows_a"), lit(0L)).as("rows_rescanned")))
        val s3 = broadcast(divergent.agg(
          count(lit(1)).as("divergent_rows")))
        s1.crossJoin(s2).crossJoin(s3)
          .select($"n_buckets", $"diverged_buckets", $"rows_total",
            $"rows_rescanned", $"divergent_rows",
            expr("rows_rescanned * 1000000 div rows_total")
              .as("rescan_ppm"))
      },
      Some("""
        WITH a AS (
          SELECT o_orderkey AS k, o_orderkey % 64 AS bucket,
                 (o_orderkey * 2654435761
                  + CAST(round(o_totalprice * 100) AS BIGINT) * 40503)
                   % 1000000007 AS rh
          FROM orders),
        b AS (
          SELECT o_orderkey AS k, o_orderkey % 64 AS bucket,
                 (o_orderkey * 2654435761
                  + CAST(round(CASE WHEN o_orderkey = 7
                      THEN o_totalprice + 1.0 ELSE o_totalprice END
                      * 100) AS BIGINT) * 40503)
                   % 1000000007 AS rh
          FROM orders WHERE o_orderkey % 997 <> 0),
        da AS (SELECT bucket, sum(rh) AS dig_a,
                      CAST(count(*) AS BIGINT) AS rows_a
               FROM a GROUP BY 1),
        db AS (SELECT bucket, sum(rh) AS dig_b,
                      CAST(count(*) AS BIGINT) AS rows_b
               FROM b GROUP BY 1),
        cmp AS (
          SELECT coalesce(da.bucket, db.bucket) AS bucket,
                 coalesce(dig_a, 0) <> coalesce(dig_b, 0) AS diverged,
                 coalesce(rows_a, 0) AS rows_a
          FROM da FULL JOIN db ON da.bucket = db.bucket),
        divb AS (SELECT bucket, rows_a FROM cmp WHERE diverged),
        divr AS (
          SELECT k, rh FROM a WHERE bucket IN (SELECT bucket FROM divb)
          EXCEPT ALL
          SELECT k, rh FROM b
          WHERE bucket IN (SELECT bucket FROM divb))
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM cmp) AS n_buckets,
               (SELECT CAST(sum(CASE WHEN diverged THEN 1 ELSE 0 END)
                  AS BIGINT) FROM cmp) AS diverged_buckets,
               (SELECT CAST(sum(rows_a) AS BIGINT) FROM cmp)
                 AS rows_total,
               (SELECT CAST(coalesce(sum(rows_a), 0) AS BIGINT)
                  FROM divb) AS rows_rescanned,
               (SELECT CAST(count(*) AS BIGINT) FROM divr)
                 AS divergent_rows,
               CAST((SELECT CAST(coalesce(sum(rows_a), 0) AS BIGINT)
                  FROM divb) * 1000000
                 // (SELECT sum(rows_a) FROM cmp) AS BIGINT)
                 AS rescan_ppm""")),

    Q(
      "q368_column_profile",
      "TABLE PROFILING REPORT (the Deequ/dbt-docs column summary every " +
        "data platform materializes before trusting a feed; q154's " +
        "table stats widened to the per-column grain): for each orders " +
        "column — row count, null count, EXACT distinct count, and " +
        "canonical min/max renderings (numerics as exact cents/key " +
        "integers, dates as ISO strings — never raw float-to-string, " +
        "whose formatting is engine-specific). All six columns profile " +
        "in ONE scan: the distinct counts ride Spark's multi-distinct " +
        "expand (6x row multiplication bounded by the column count, " +
        "map-side partial-agg'd), min/max/null are plain partials, and " +
        "the one-row result unpivots by stack onto the 6-row column " +
        "domain. 100 TB: one pass, no joins — profiling cost tracks " +
        "the scan, not the column count.",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
          .withColumn("cents",
            expr("cast(round(o_totalprice * 100) as bigint)"))
          .withColumn("od", $"o_orderdate".cast("date"))
        val a = o.agg(
          count(lit(1)).as("n_rows"),
          sum($"o_orderkey".isNull.cast("long")).as("nn1"),
          countDistinct($"o_orderkey").as("nd1"),
          min($"o_orderkey").cast("string").as("mn1"),
          max($"o_orderkey").cast("string").as("mx1"),
          sum($"o_custkey".isNull.cast("long")).as("nn2"),
          countDistinct($"o_custkey").as("nd2"),
          min($"o_custkey").cast("string").as("mn2"),
          max($"o_custkey").cast("string").as("mx2"),
          sum($"o_orderstatus".isNull.cast("long")).as("nn3"),
          countDistinct($"o_orderstatus").as("nd3"),
          min($"o_orderstatus").as("mn3"),
          max($"o_orderstatus").as("mx3"),
          sum($"cents".isNull.cast("long")).as("nn4"),
          countDistinct($"cents").as("nd4"),
          min($"cents").cast("string").as("mn4"),
          max($"cents").cast("string").as("mx4"),
          sum($"od".isNull.cast("long")).as("nn5"),
          countDistinct($"od").as("nd5"),
          min($"od").cast("string").as("mn5"),
          max($"od").cast("string").as("mx5"),
          sum($"o_orderpriority".isNull.cast("long")).as("nn6"),
          countDistinct($"o_orderpriority").as("nd6"),
          min($"o_orderpriority").as("mn6"),
          max($"o_orderpriority").as("mx6"))
        a.selectExpr("stack(6, " +
            "'o_orderkey', nn1, nd1, mn1, mx1, " +
            "'o_custkey', nn2, nd2, mn2, mx2, " +
            "'o_orderstatus', nn3, nd3, mn3, mx3, " +
            "'o_totalprice_cents', nn4, nd4, mn4, mx4, " +
            "'o_orderdate', nn5, nd5, mn5, mx5, " +
            "'o_orderpriority', nn6, nd6, mn6, mx6) " +
            "as (col_name, n_nulls, n_distinct, min_repr, max_repr)",
            "n_rows")
          .select($"col_name", $"n_rows", $"n_nulls", $"n_distinct",
            $"min_repr", $"max_repr")
          .orderBy($"col_name")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                 CAST(o_orderdate AS DATE) AS od, o_orderpriority
          FROM orders),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0
                   END) AS BIGINT) AS nn1,
                 CAST(count(DISTINCT o_orderkey) AS BIGINT) AS nd1,
                 CAST(min(o_orderkey) AS VARCHAR) AS mn1,
                 CAST(max(o_orderkey) AS VARCHAR) AS mx1,
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0
                   END) AS BIGINT) AS nn2,
                 CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd2,
                 CAST(min(o_custkey) AS VARCHAR) AS mn2,
                 CAST(max(o_custkey) AS VARCHAR) AS mx2,
                 CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0
                   END) AS BIGINT) AS nn3,
                 CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
                 min(o_orderstatus) AS mn3, max(o_orderstatus) AS mx3,
                 CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS nn4,
                 CAST(count(DISTINCT cents) AS BIGINT) AS nd4,
                 CAST(min(cents) AS VARCHAR) AS mn4,
                 CAST(max(cents) AS VARCHAR) AS mx4,
                 CAST(sum(CASE WHEN od IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS nn5,
                 CAST(count(DISTINCT od) AS BIGINT) AS nd5,
                 CAST(min(od) AS VARCHAR) AS mn5,
                 CAST(max(od) AS VARCHAR) AS mx5,
                 CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1
                   ELSE 0 END) AS BIGINT) AS nn6,
                 CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                   AS nd6,
                 min(o_orderpriority) AS mn6,
                 max(o_orderpriority) AS mx6
          FROM o),
        u AS (
          SELECT 'o_orderkey' AS col_name, n_rows, nn1 AS n_nulls,
                 nd1 AS n_distinct, mn1 AS min_repr, mx1 AS max_repr
          FROM a
          UNION ALL SELECT 'o_custkey', n_rows, nn2, nd2, mn2, mx2
          FROM a
          UNION ALL SELECT 'o_orderstatus', n_rows, nn3, nd3, mn3, mx3
          FROM a
          UNION ALL SELECT 'o_totalprice_cents', n_rows, nn4, nd4,
            mn4, mx4 FROM a
          UNION ALL SELECT 'o_orderdate', n_rows, nn5, nd5, mn5, mx5
          FROM a
          UNION ALL SELECT 'o_orderpriority', n_rows, nn6, nd6, mn6,
            mx6 FROM a)
        SELECT col_name, n_rows, n_nulls, n_distinct, min_repr,
               max_repr
        FROM u ORDER BY col_name""")),

    Q(
      "q408_damerau_fuzzy_pairs",
      "TRANSPOSITION-AWARE FUZZY NAME MATCHING on a NATIVE " +
        "DAMERAU-LEVENSHTEIN kernel (graft.catalyst.DamerauLev — the " +
        "unrestricted Lowrance-Wagner 1975 algorithm, codegen'd like " +
        "q373's Hilbert kernel; Spark ships only plain levenshtein, " +
        "and Damerau 1964 measured ~80% of human misspellings as " +
        "single adjacent transpositions, so record linkage wants " +
        "this metric): TWO blocked pair families scored with BOTH " +
        "metrics so `saved` = lev - dl exposes exactly where " +
        "transposition awareness changes the verdict — product names " +
        "within a NOUN block (adjective typos; the blocking step " +
        "that keeps the O(|s||t|)-per-pair DP off any fact-scale " +
        "cross product) and supplier names at dl<=1, where digit-" +
        "adjacent ids like ...012/...021 are exactly the single-" +
        "transposition near-misses this metric catches (dl=1, " +
        "lev=2, 45 such pairs at sf0.01). " +
        "Distances are small integers — the oracle's independent " +
        "damerau_levenshtein implementation must agree bit-for-bit " +
        "on every pair (the two implementations were cross-verified " +
        "on 3000 random pairs; KernelPropertySpec pins the metric " +
        "properties OSA violates). 100 TB: names dedup FIRST (one " +
        "distinct); part nouns are a bounded domain, and supplier " +
        "names — whose domain grows linearly with scale because the " +
        "suppkey is embedded — block on the LOSSLESS FastSS " +
        "delete-one neighborhood (Bocek et al. 2007), keeping the " +
        "candidate join linear in the domain instead of quadratic; " +
        "the kernel is one static call inside whole-stage codegen.",
      (s, dir) => {
        import s.implicits._
        import graft.catalyst.DamerauLev.damerau_levenshtein
        // `keys` returns the ARRAY of block keys a name belongs to; a
        // candidate pair is any two names sharing >= 1 key (exploded
        // equi-join, then distinct — a pair sharing several keys must
        // score once), and the exact DP filter makes any lossless
        // over-generation harmless
        def scored(df: org.apache.spark.sql.DataFrame, family: String,
            keys: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
            maxDl: Int) = {
          val names = df.distinct()
            .select(col(df.columns.head).as("name"))
            .withColumn("blk", explode(keys(col("name"))))
          val a = names.select($"name".as("name_a"), $"blk")
          val b = names.select($"name".as("name_b"), $"blk".as("blk_b"))
          a.join(b, $"blk" === $"blk_b" && $"name_a" < $"name_b")
            .select($"name_a", $"name_b").distinct()
            .select($"name_a", $"name_b",
              damerau_levenshtein($"name_a", $"name_b").as("dl"),
              levenshtein($"name_a", $"name_b").as("lev"))
            .filter($"dl" <= maxDl)
            .select(lit(family).as("family"), $"name_a", $"name_b",
              $"dl".cast("long").as("dl"),
              $"lev".cast("long").as("lev"),
              ($"lev" - $"dl").cast("long").as("saved"))
        }
        // part names block on the noun (adjective typos, no digit
        // structure). Supplier names embed the suppkey, so their
        // distinct domain grows LINEARLY with scale factor and a
        // single shared block would make the self-join O(|supplier|^2)
        // — instead they block on the FastSS delete-one-character
        // neighborhood (Bocek et al. 2007), which is LOSSLESS at
        // dl<=1: a substitution pair shares the variant deleting the
        // substituted position, a transposition xABy/xBAy shares xBy
        // (delete 'A' from both), and an insertion pair contains the
        // shorter name in both key sets — so every dl<=1 pair meets
        // in >= 1 bucket, buckets stay O(1) (names sharing a delete-1
        // variant), and the candidate count is linear in the domain.
        // Digit-adjacent ids like ...012 / ...021 are exactly the
        // single-transposition near-misses the metric exists to
        // catch (dl=1, lev=2, 45 such pairs at sf0.01).
        scored(Tables.t(s, dir, "part").select($"p_name"),
            "part_name", n => array(split(n, " ").getItem(1)), 4)
          .unionAll(scored(
            Tables.t(s, dir, "supplier").select($"s_name"),
            "supplier_name",
            _ => expr("array_distinct(concat(array(name), " +
              "transform(sequence(1, length(name)), i -> " +
              "concat(substring(name, 1, i - 1), " +
              "substring(name, i + 1, length(name))))))"), 1))
          .orderBy($"family", $"name_a", $"name_b")
      },
      Some("""
        WITH pn AS (SELECT DISTINCT p_name AS name FROM part),
        pp AS (
          SELECT 'part_name' AS family, a.name AS name_a,
                 b.name AS name_b,
                 damerau_levenshtein(a.name, b.name) AS dl,
                 levenshtein(a.name, b.name) AS lev
          FROM pn a JOIN pn b
            ON split_part(a.name, ' ', 2) = split_part(b.name, ' ', 2)
           AND a.name < b.name
          WHERE damerau_levenshtein(a.name, b.name) <= 4),
        sn AS (SELECT DISTINCT s_name AS name FROM supplier),
        sp AS (
          SELECT 'supplier_name' AS family, a.name AS name_a,
                 b.name AS name_b,
                 damerau_levenshtein(a.name, b.name) AS dl,
                 levenshtein(a.name, b.name) AS lev
          FROM sn a JOIN sn b ON a.name < b.name
          WHERE damerau_levenshtein(a.name, b.name) <= 1),
        u AS (SELECT * FROM pp UNION ALL SELECT * FROM sp)
        SELECT family, name_a, name_b, CAST(dl AS BIGINT) AS dl,
               CAST(lev AS BIGINT) AS lev,
               CAST(lev - dl AS BIGINT) AS saved
        FROM u ORDER BY family, name_a, name_b"""))
  )
}
