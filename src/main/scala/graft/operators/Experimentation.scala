package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation & causal-analytics operators: the A/B two-proportion
  * test, the chi-square independence drift audit, last-touch conversion
  * attribution, and matched-control pairing. The product-analytics layer a
  * data platform grows the moment events flow through it (the reference's
  * MySQL sink exists to feed exactly this kind of SQL —
  * mysql_public_data_ingestor README "analyze with plain SQL"), expressed
  * with the repo-wide exact-arithmetic recipe: every statistic that a
  * float would smear is carried as a cross-multiplied integer rational
  * (q168/q194/q198's trick), so the DuckDB oracle is bit-for-bit and the
  * result is identical on any cluster size or reduction order.
  */
object Experimentation extends QueryModule {

  /** The cross-multiplied KS sweep shared by q240 (global) and q242's
    * streaming per-day monitor — ONE definition so the ECDF arithmetic,
    * tie rule (smallest bucket at the max), and the decimal-internal
    * significance compare cannot diverge between the batch test and
    * the monitor. Input: (groupCols..., bucket, c1, c2) counts over the
    * bounded bucket domain. Output per group: n1, n2, d_ppm,
    * d_at_bucket, ks_reject_95 (alpha = 0.05, c^2 micro-scaled =
    * 1844164). All windows run on the bucket DOMAIN, never rows. */
  def ksStats(counts: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import counts.sparkSession.implicits._
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(g: _*)
    counts.select((g ++ Seq($"bucket",
        sum($"c1").over(w).as("f1"), sum($"c2").over(w).as("f2"),
        sum($"c1").over(wg).as("n1"), sum($"c2").over(wg).as("n2"))): _*)
      .withColumn("diff", abs($"f1" * $"n2" - $"f2" * $"n1"))
      .withColumn("dmax", max($"diff").over(wg))
      .groupBy(g: _*)
      .agg(min($"n1").as("n1"), min($"n2").as("n2"),
        min($"dmax").as("d_num"),
        min(when($"diff" === $"dmax", $"bucket")).as("d_at_bucket"))
      .select((g ++ Seq($"n1", $"n2",
        // one-armed groups (a tiny day with every purchase on one
        // parity) have no two-sample statistic: NULL, and never the
        // div-by-zero the raw expression would raise under ANSI
        expr("case when n1 = 0 or n2 = 0 then null " +
          "else (d_num * 1000000) div (n1 * n2) end").as("d_ppm"),
        when($"n1" === 0 || $"n2" === 0, lit(null))
          .otherwise($"d_at_bucket").as("d_at_bucket"),
        expr("n1 > 0 and n2 > 0 and " +
          "cast(d_num as decimal(38,0)) * d_num * 1000000 > " +
          "1844164 * cast(n1 as decimal(38,0)) * n2 * (n1 + n2)")
          .as("ks_reject_95"))): _*)
  }

  /** The attribution family's shared TOUCH UNIVERSE (q213 linear, q251
    * position-based; q210's window form is the join-free equivalent,
    * spec-asserted to agree on organic sets): purchases p = (user_id,
    * pid, pus, cents) and the touch join j = (pid, cents, ch, k, rn)
    * where a click touches a purchase iff it precedes it in (ts,
    * event_id) order within 24 h, k = touches per purchase, rn = 1 is
    * the MOST RECENT touch. One definition so the tie rule and lookback
    * can never diverge between credit models — their comparability
    * (identical touch sets, only the split rule differs) is a declared
    * contract, enforced structurally here and cross-checked in
    * ExperimentationSpec. */
  def touchUniverse(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import s.implicits._
    val ev = Tables.t(s, dir, "events")
      .withColumn("us", unix_micros($"ts".cast("timestamp")))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), $"us".as("pus"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("cid"), $"us".as("cus"),
        expr("cast(get_json_object(props, '$.k') as bigint) div 25")
          .as("ch"))
    val wOrd = Window.partitionBy($"pid").orderBy($"cus".desc, $"cid".desc)
    val j = p.join(c, Seq("user_id"))
      // same-µs ties break by event_id exactly as q210's
      // (ts, event_id)-ordered window does — a click that sorts AFTER
      // the purchase in that sequence is not a touch, so the models'
      // organic sets agree at timestamp ties
      .filter(($"cus" < $"pus" ||
        ($"cus" === $"pus" && $"cid" < $"pid")) &&
        $"pus" - $"cus" <= 86400000000L)
      // one select so k and rn share one pid-keyed window operator;
      // age_us rides along for the time-decay model (q284) — additive,
      // ignored by the flat-split models
      .select($"pid", $"cents", $"ch", ($"pus" - $"cus").as("age_us"),
        count(lit(1)).over(wOrd.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("k"),
        row_number().over(wOrd).as("rn"))
    (p, j)
  }

  override def queries: Seq[Q] = Seq(
    Q(
      "q208_ab_test",
      "A/B TWO-PROPORTION TEST with an exact-rational z^2 statistic: arms " +
        "by user_id parity, unit = (user, event-day), conversion = the " +
        "unit saw a purchase. z^2 = N*d^2 / (n_a*n_b*C*(N-C)) with " +
        "d = c_a*n_b - c_b*n_a (the pooled two-proportion z, squared — " +
        "algebraically cleared of every division), carried as a " +
        "DECIMAL(38,0) numerator/denominator pair: N*d^2 reaches ~1e22 " +
        "at sf0.1 so int64 would overflow, and a float z would make " +
        "significance flip with summation order. The 95% call compares " +
        "z2_num*1e6 > 3841459*z2_den (chi^2_{1,0.05} = 3.841459 " +
        "micro-scaled) — pure integer compare, no sqrt, no rounding. " +
        "The num/den pair is EMITTED as canonical digit strings: the " +
        "round-8 driver hash proved decimal-representation-sensitive " +
        "(Spark FIXED_LEN_BYTE_ARRAY vs DuckDB int128 DECIMAL hashed " +
        "differently with bit-identical values — round 6's HUGEINT " +
        "lesson one level deeper), and a scale-0 decimal's digit string " +
        "is exact on both engines. tools/check.py now lints DECIMAL out " +
        "of every output schema. " +
        "Plan: one (arm, user, day) aggregate with map-side partials " +
        "(the only row-scale shuffle), then a single-row reduction — " +
        "the same two-level shape at 100 TB; the decimal algebra rides " +
        "on four scalars.",
      (s, dir) => {
        import s.implicits._
        val units = Tables.t(s, dir, "events")
          // user_id is non-negative in the fixtures (FixtureContractSpec
          // asserts min(user_id) >= 0 in every sf dir); % therefore
          // matches DuckDB's % on both arms
          .groupBy(($"user_id" % 2).as("arm"), $"user_id",
            date_trunc("DAY", $"ts").as("day"))
          .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("conv"))
        units
          .agg(
            sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when($"arm" === 0, $"conv").otherwise(0L)).as("c_a"),
            sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when($"arm" === 1, $"conv").otherwise(0L)).as("c_b"))
          .withColumn("d",
            expr("cast(c_a as decimal(38,0)) * n_b - cast(c_b as decimal(38,0)) * n_a"))
          .withColumn("cc", expr("cast(c_a + c_b as decimal(38,0))"))
          .withColumn("nn", expr("cast(n_a + n_b as decimal(38,0))"))
          .withColumn("den",
            expr("cast(cast(n_a as decimal(38,0)) * n_b * cc * (nn - cc) as decimal(38,0))"))
          .select(
            $"n_a", $"c_a", $"n_b", $"c_b",
            expr("(10000 * c_a) div n_a").as("rate_a_bp"),
            expr("(10000 * c_b) div n_b").as("rate_b_bp"),
            expr("cast(cast(nn * d * d as decimal(38,0)) as string)")
              .as("z2_num"),
            $"den".cast("string").as("z2_den"),
            expr("nn * d * d * 1000000 > 3841459 * den").as("significant_95"))
      },
      Some("""
        WITH u AS (
          SELECT user_id % 2 AS arm, user_id, date_trunc('day', ts) AS day,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY 1, 2, 3),
        a AS (
          SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                 CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
          FROM u),
        b AS (
          SELECT n_a, c_a, n_b, c_b,
                 CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a AS d,
                 CAST(c_a + c_b AS HUGEINT) AS cc,
                 CAST(n_a + n_b AS HUGEINT) AS nn
          FROM a)
        SELECT n_a, c_a, n_b, c_b,
               CAST((10000 * c_a) // n_a AS BIGINT) AS rate_a_bp,
               CAST((10000 * c_b) // n_b AS BIGINT) AS rate_b_bp,
               CAST(nn * d * d AS VARCHAR) AS z2_num,
               CAST(CAST(n_a AS HUGEINT) * n_b * cc * (nn - cc) AS VARCHAR) AS z2_den,
               (nn * d * d * 1000000 > 3841459 * CAST(n_a AS HUGEINT) * n_b * cc * (nn - cc)) AS significant_95
        FROM b""")),

    Q(
      "q209_chi_square_drift",
      "CHI-SQUARE INDEPENDENCE AUDIT of the source x lang contingency " +
        "table (is language mix independent of source? — the categorical " +
        "drift test that complements q136's numeric source drift): per " +
        "cell, observed count, expected count in milli-units " +
        "((R*C*1000) div G — exact integer floor on both engines), the " +
        "chi-square contribution (O*G - R*C)^2 / (G*R*C) in basis points " +
        "via the TWO-STEP floor split q = d^2 div den; bp = q*10^4 + " +
        "(d^2 mod den)*10^4 div den — algebraically floor(contrib*10^4) " +
        "without ever forming d^2*10^4 (which would overflow int64 at " +
        "sf0.1), and a per-cell outlier flag (contribution > 3.841459, " +
        "the |standardized residual| > 1.96 heuristic) compared in " +
        "DECIMAL(38,0) because 3841459*den crosses int64 right at sf0.1. " +
        "Plan: one row-scale aggregate to the cell domain (map-side " +
        "partials), then windows OVER the |sources| x |langs| <= 100-row " +
        "cell frame — the unpartitioned window runs on the bounded " +
        "domain, never on rows (q199's bucket-domain argument), so the " +
        "same plan holds at 100 TB.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .groupBy($"source", $"lang").agg(count(lit(1)).as("obs"))
          .withColumn("r", sum($"obs").over(Window.partitionBy($"source")))
          .withColumn("cl", sum($"obs").over(Window.partitionBy($"lang")))
          .withColumn("g", sum($"obs").over(
            Window.partitionBy())) // cell domain only — bounded
          .withColumn("dv", expr("obs * g - r * cl"))
          .withColumn("den", expr("g * r * cl"))
          .select(
            $"source", $"lang", $"obs",
            expr("(r * cl * 1000) div g").as("exp_milli"),
            // dv^2 in DECIMAL(38,0): int64 has only ~1.5x headroom at
            // sf0.1 worst case (|dv| can approach 2.5e9 on a strongly
            // dependent table), and Spark would wrap silently where
            // DuckDB errors — same DECIMAL move outlier_cell made
            expr("(cast(dv as decimal(38,0)) * dv div den) * 10000 + " +
              "((cast(dv as decimal(38,0)) * dv % den) * 10000) div den")
              .as("contrib_bp"),
            expr("cast(dv as decimal(38,0)) * dv * 1000000 > 3841459 * cast(den as decimal(38,0))")
              .as("outlier_cell"))
          .orderBy($"source", $"lang")
      },
      Some("""
        WITH cells AS (
          SELECT source, lang, count(*) AS obs FROM documents GROUP BY 1, 2),
        m AS (
          SELECT source, lang, obs,
                 sum(obs) OVER (PARTITION BY source) AS r,
                 sum(obs) OVER (PARTITION BY lang) AS cl,
                 sum(obs) OVER () AS g
          FROM cells),
        d AS (
          SELECT source, lang, obs, r, cl, g,
                 obs * g - r * cl AS dv, g * r * cl AS den
          FROM m)
        SELECT source, lang, CAST(obs AS BIGINT) AS obs,
               CAST((r * cl * 1000) // g AS BIGINT) AS exp_milli,
               CAST((CAST(dv AS HUGEINT) * dv // den) * 10000
                    + ((CAST(dv AS HUGEINT) * dv % den) * 10000) // den
                 AS BIGINT) AS contrib_bp,
               (dv * dv * 1000000 > 3841459 * den) AS outlier_cell
        FROM d ORDER BY source, lang""")),

    Q(
      "q210_last_touch_attribution",
      "LAST-TOUCH CONVERSION ATTRIBUTION: each purchase credits the most " +
        "recent preceding click by the same user within a 24 h lookback " +
        "(channel = the click's props.k div 25, four channels; no click " +
        "in window -> 'organic'), reporting conversions and exact " +
        "integer-cents revenue per channel. The carry is " +
        "last(click, ignoreNulls) OVER (user ORDER BY ts, event_id ROWS " +
        "UNBOUNDED PRECEDING) — the running-last-observation idiom that " +
        "generalizes the as-of join (q18) to in-stream self-attribution " +
        "without any join at all: ONE user_id exchange, a linear " +
        "per-user scan, map-side-combined channel totals. Both carried " +
        "columns (click epoch-us and channel) share one WindowSpec so " +
        "Spark evaluates a single window operator. event_id breaks ts " +
        "ties identically on both engines; revenue sums " +
        "round(value*100) cents so the aggregate is order-independent " +
        "integer arithmetic (the q154 double-rendering lesson).",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.t(s, dir, "events")
          .withColumn("us", unix_micros($"ts".cast("timestamp")))
          // both carries in ONE select so they land in one Window operator
          // (chained withColumn leaves two Window nodes the optimizer's
          // CollapseWindow can't merge across the intervening Project —
          // i.e. two per-user sorts; PlanSpec gates this)
          .select($"*",
            last(when($"event_type" === "click", $"us"), ignoreNulls = true)
              .over(w).as("click_us"),
            last(when($"event_type" === "click",
              expr("cast(get_json_object(props, '$.k') as bigint) div 25")),
              ignoreNulls = true).over(w).as("click_ch"))
          .filter($"event_type" === "purchase")
          .select(
            when($"click_us".isNotNull &&
                 ($"us" - $"click_us") <= 86400000000L,
              concat(lit("ch"), $"click_ch")).otherwise("organic")
              .as("channel"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
          .groupBy($"channel")
          .agg(count(lit(1)).as("n_conversions"),
            sum($"cents").as("revenue_cents"))
          .orderBy($"channel")
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_type, ts, value,
                 last_value(CASE WHEN event_type = 'click'
                                 THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_us,
                 last_value(CASE WHEN event_type = 'click'
                                 THEN CAST(json_extract(props, 'k') AS BIGINT) // 25 END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ch
          FROM events),
        p AS (
          SELECT CASE WHEN click_us IS NOT NULL
                      AND epoch_us(CAST(ts AS TIMESTAMP)) - click_us <= 86400000000
                      THEN 'ch' || CAST(click_ch AS VARCHAR) ELSE 'organic' END AS channel,
                 value
          FROM seq WHERE event_type = 'purchase')
        SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM p GROUP BY channel ORDER BY channel""")),

    Q(
      "q212_srm_check",
      "SAMPLE-RATIO-MISMATCH GUARDRAIL (the first thing a trustworthy " +
        "experimentation platform checks — a skewed split means the " +
        "assignment itself is broken and q208's p-value is meaningless): " +
        "distinct USERS per arm (assignment units, never events — event " +
        "counts would let one chatty user fake an imbalance), the " +
        "goodness-of-fit chi-square against the 50/50 design collapsed " +
        "to (n_a-n_b)^2/N, exact in basis points (values stay ~1e13, " +
        "int64-safe at any plausible user count), and the alarm as the " +
        "integer compare (n_a-n_b)^2*1e6 > 3841459*N. Plan: one distinct " +
        "on (arm, user) with map-side partials, then a two-row " +
        "reduction — nothing here scales with event volume.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .select(($"user_id" % 2).as("arm"), $"user_id").distinct()
          .agg(
            sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"))
          .select($"n_a", $"n_b",
            expr("((n_a - n_b) * (n_a - n_b) * 10000) div (n_a + n_b)")
              .as("chi2_bp"),
            expr("(n_a - n_b) * (n_a - n_b) * 1000000 > 3841459 * (n_a + n_b)")
              .as("srm_detected"))
      },
      Some("""
        WITH a AS (
          SELECT CAST(count(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END) AS BIGINT) AS n_a,
                 CAST(count(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END) AS BIGINT) AS n_b
          FROM events)
        SELECT n_a, n_b,
               CAST(((n_a - n_b) * (n_a - n_b) * 10000) // (n_a + n_b) AS BIGINT) AS chi2_bp,
               ((n_a - n_b) * (n_a - n_b) * 1000000 > 3841459 * (n_a + n_b)) AS srm_detected
        FROM a""")),

    Q(
      "q213_linear_attribution",
      "LINEAR MULTI-TOUCH ATTRIBUTION with EXACT credit conservation: " +
        "every click by the same user within 24 h before a purchase " +
        "shares that purchase's integer cents equally — cents div k to " +
        "each touch, the division remainder to the MOST RECENT touch — " +
        "and purchases with no touch credit 'organic' in full, so " +
        "sum(credit) == total purchase revenue TO THE CENT (the " +
        "conservation invariant ExperimentationSpec asserts; a float " +
        "1/k split never conserves). The multi-touch complement of " +
        "q210's last-touch: same lookback, credit spread instead of " +
        "winner-take-all. Plan: purchases x clicks is a USER-keyed " +
        "equi-join with the 24 h range as a residual predicate (bounded " +
        "per user-day, never a cross product), touch count + recency " +
        "rank share one purchase-keyed window, organic is a left-anti " +
        "on the matched purchase set, and channel totals combine " +
        "map-side.",
      (s, dir) => {
        import s.implicits._
        val (p, j) = touchUniverse(s, dir)
        val touched = j.select(
          concat(lit("ch"), $"ch").as("channel"),
          when($"rn" === 1, $"cents" - ($"k" - 1) * expr("cents div k"))
            .otherwise(expr("cents div k")).as("credit"))
        val organic = p
          .join(j.select($"pid"), Seq("pid"), "left_anti")
          .select(lit("organic").as("channel"), $"cents".as("credit"))
        touched.unionByName(organic)
          .groupBy($"channel")
          .agg(count(lit(1)).as("n_touches"), sum($"credit").as("credit_cents"))
          .orderBy($"channel")
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id AS pid, epoch_us(CAST(ts AS TIMESTAMP)) AS pus,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, event_id AS cid, epoch_us(CAST(ts AS TIMESTAMP)) AS cus,
                 CAST(json_extract(props, 'k') AS BIGINT) // 25 AS ch
          FROM events WHERE event_type = 'click'),
        j AS (
          SELECT p.pid, p.cents, c.ch,
                 count(*) OVER (PARTITION BY p.pid) AS k,
                 row_number() OVER (PARTITION BY p.pid ORDER BY c.cus DESC, c.cid DESC) AS rn
          FROM p JOIN c ON p.user_id = c.user_id
                       AND (c.cus < p.pus
                            OR (c.cus = p.pus AND c.cid < p.pid))
                       AND p.pus - c.cus <= 86400000000),
        touched AS (
          SELECT 'ch' || CAST(ch AS VARCHAR) AS channel,
                 CASE WHEN rn = 1 THEN cents - (k - 1) * (cents // k)
                      ELSE cents // k END AS credit
          FROM j),
        organic AS (
          SELECT 'organic' AS channel, cents AS credit
          FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid))
        SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(credit) AS BIGINT) AS credit_cents
        FROM (SELECT * FROM touched UNION ALL SELECT * FROM organic)
        GROUP BY channel ORDER BY channel""")),

    Q(
      "q215_cuped_adjustment",
      "CUPED VARIANCE-REDUCED TREATMENT EFFECT (Deng et al. 2013, the " +
        "industry-standard experiment sensitivity boost), EXACT: " +
        "pre-period covariate x = per-user purchases in days 1-15, " +
        "outcome y = purchases in days 16-30, arms by user parity. " +
        "theta = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) and the adjusted " +
        "difference (Ybar_a - Ybar_b) - theta*(Xbar_a - Xbar_b) are both " +
        "RATIONAL in integer sums, so they're carried as DECIMAL(38,0) " +
        "num/den pairs — cleared of every division, immune to float " +
        "accumulation order (adj_diff_num crosses 1e15 at sf0.1 and " +
        "1e23 at web scale; decimal, never double) — and EMITTED as " +
        "canonical digit strings, q208's representation-stable " +
        "rendering (the driver hash distinguishes Spark's parquet " +
        "decimal encoding from DuckDB's int128 one; a scale-0 digit " +
        "string is encoding-free and loses nothing). Fixed-point views " +
        "(raw_diff_e4, adj_diff_e4 = value*1e4; rho2_bp = the fraction " +
        "of outcome variance CUPED removes) come from DECIMAL `div` — " +
        "Spark's IntegralDivide and DuckDB's // both truncate toward " +
        "zero, so even negative diffs agree bit-for-bit. Plan: one " +
        "(arm, user) aggregate with map-side partials (the only " +
        "row-scale shuffle — same shape as q208), then an 11-sum " +
        "single-row reduction; the decimal algebra is O(1).",
      (s, dir) => {
        import s.implicits._
        val cut = "timestamp'2024-01-16 00:00:00'"
        val u = Tables.t(s, dir, "events")
          .groupBy(($"user_id" % 2).as("arm"), $"user_id")
          .agg(
            sum(when(expr(s"ts < $cut") && $"event_type" === "purchase",
              1L).otherwise(0L)).as("x"),
            sum(when(expr(s"ts >= $cut") && $"event_type" === "purchase",
              1L).otherwise(0L)).as("y"))
        u.agg(
          count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"),
          sum($"y" * $"y").as("syy"),
          sum(when($"arm" === 0, 1L).otherwise(0L)).as("na"),
          sum(when($"arm" === 0, $"x").otherwise(0L)).as("sxa"),
          sum(when($"arm" === 0, $"y").otherwise(0L)).as("sya"),
          sum(when($"arm" === 1, 1L).otherwise(0L)).as("nb"),
          sum(when($"arm" === 1, $"x").otherwise(0L)).as("sxb"),
          sum(when($"arm" === 1, $"y").otherwise(0L)).as("syb"))
          .withColumn("tn",
            expr("cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy"))
          .withColumn("td",
            expr("cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"))
          .withColumn("vy",
            expr("cast(n as decimal(38,0)) * syy - cast(sy as decimal(38,0)) * sy"))
          .withColumn("dya",
            expr("cast(sya as decimal(38,0)) * nb - cast(syb as decimal(38,0)) * na"))
          .withColumn("dxa",
            expr("cast(sxa as decimal(38,0)) * nb - cast(sxb as decimal(38,0)) * na"))
          .withColumn("adj_num", expr("dya * td - tn * dxa"))
          .withColumn("adj_den",
            expr("cast(na as decimal(38,0)) * nb * td"))
          .select(
            $"na".as("n_a"), $"nb".as("n_b"),
            expr("(10000 * dya) div (cast(na as decimal(38,0)) * nb)")
              .as("raw_diff_e4"),
            expr("(10000 * adj_num) div adj_den").as("adj_diff_e4"),
            expr("cast(cast(tn as decimal(38,0)) as string)").as("theta_num"),
            expr("cast(cast(td as decimal(38,0)) as string)").as("theta_den"),
            expr("cast(cast(adj_num as decimal(38,0)) as string)")
              .as("adj_diff_num"),
            expr("cast(cast(adj_den as decimal(38,0)) as string)")
              .as("adj_diff_den"),
            expr("(10000 * tn * tn) div (td * vy)").as("rho2_bp"))
      },
      Some("""
        WITH u AS (
          SELECT user_id % 2 AS arm, user_id,
                 CAST(sum(CASE WHEN ts <  TIMESTAMP '2024-01-16 00:00:00'
                                AND event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS x,
                 CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                                AND event_type = 'purchase' THEN 1 ELSE 0 END) AS HUGEINT) AS y
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT CAST(count(*) AS HUGEINT) AS n,
                 sum(x) AS sx, sum(y) AS sy,
                 sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS na,
                 sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sxa,
                 sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sya,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nb,
                 sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sxb,
                 sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS syb
          FROM u),
        t AS (
          SELECT *, n*sxy - sx*sy AS tn, n*sxx - sx*sx AS td, n*syy - sy*sy AS vy,
                 sya*nb - syb*na AS dya, sxa*nb - sxb*na AS dxa
          FROM s)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST((10000 * dya) // (na*nb) AS BIGINT) AS raw_diff_e4,
               CAST((10000 * (dya*td - tn*dxa)) // (na*nb*td) AS BIGINT) AS adj_diff_e4,
               CAST(tn AS VARCHAR) AS theta_num,
               CAST(td AS VARCHAR) AS theta_den,
               CAST(dya*td - tn*dxa AS VARCHAR) AS adj_diff_num,
               CAST(na*nb*td AS VARCHAR) AS adj_diff_den,
               CAST((10000 * tn * tn) // (td * vy) AS BIGINT) AS rho2_bp
        FROM t""")),

    Q(
      "q211_matched_controls",
      "MATCHED-CONTROL PAIRING (covariate matching for causal reads and " +
        "eval-set construction — q167's negative sampling picks ANY " +
        "negative, this picks the COMPARABLE one): treatment docs " +
        "(length(source)=4, src0-src9) pair 1:1 with control docs " +
        "(src10-src19) of the SAME lang and 64-char length bucket, " +
        "matched by deterministic rank inside each stratum. Ranking key " +
        "is q204's overflow-safe quadratic mix ((doc_id mod M)^2 + " +
        "s*48271 mod M, M = 2^31-1 — squaring the RAW id would overflow " +
        "int64 on web-scale ids), doc_id tie-break. Unmatched surplus in " +
        "a stratum drops out via the inner rank-join — exactly the " +
        "matched-pairs estimator's discard rule. Plan: one (lang, " +
        "bucket, treat) keyed window for row_number (no global sort), " +
        "then an equi-join on (lang, bucket, rank) — both sides " +
        "pre-partitioned by the same stratum keys, so AQE sees a " +
        "co-partitioned join at any scale.",
      (s, dir) => {
        import s.implicits._
        val M = 2147483647L
        val ranked = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang", $"n_chars",
            expr("n_chars div 64").as("bucket"),
            (length($"source") === 4).cast("int").as("treat"))
          .withColumn("sd", $"doc_id" % M)
          .withColumn("h", ($"sd" * $"sd" + $"sd" * 48271L) % M)
          .withColumn("rk", row_number().over(
            Window.partitionBy($"lang", $"bucket", $"treat")
              .orderBy($"h", $"doc_id")))
        val t = ranked.filter($"treat" === 1)
          .select($"lang", $"bucket", $"rk",
            $"doc_id".as("treat_doc"), $"n_chars".as("t_chars"))
        val c = ranked.filter($"treat" === 0)
          .select($"lang", $"bucket", $"rk",
            $"doc_id".as("control_doc"), $"n_chars".as("c_chars"))
        t.join(c, Seq("lang", "bucket", "rk"))
          .select($"lang", $"bucket", $"treat_doc", $"control_doc",
            abs($"t_chars" - $"c_chars").as("char_gap"))
          .orderBy($"lang", $"bucket", $"treat_doc")
      },
      Some("""
        WITH pool AS (
          SELECT doc_id, lang, n_chars, n_chars // 64 AS bucket,
                 CAST(length(source) = 4 AS INT) AS treat,
                 doc_id % 2147483647 AS sd
          FROM documents),
        r AS (
          SELECT *, (sd * sd + sd * 48271) % 2147483647 AS h FROM pool),
        rk AS (
          SELECT *, row_number() OVER (PARTITION BY lang, bucket, treat
                                       ORDER BY h, doc_id) AS rk
          FROM r)
        SELECT t.lang, CAST(t.bucket AS BIGINT) AS bucket,
               t.doc_id AS treat_doc, c.doc_id AS control_doc,
               CAST(abs(t.n_chars - c.n_chars) AS BIGINT) AS char_gap
        FROM rk t JOIN rk c
          ON t.lang = c.lang AND t.bucket = c.bucket AND t.rk = c.rk
         AND t.treat = 1 AND c.treat = 0
        ORDER BY t.lang, bucket, treat_doc""")),

    Q(
      "q240_ks_drift",
      "TWO-SAMPLE KOLMOGOROV-SMIRNOV DRIFT TEST — the distributional " +
        "complement of the drift family (q136 integer L1 on summary " +
        "stats, q209 chi-square on categories; KS catches a SHAPE " +
        "change those two miss, e.g. variance doubling at equal mean): " +
        "purchase amounts by arm (user parity), D = max |F1 - F2| over " +
        "the merged dollar-bucket domain, carried EXACTLY as D_num = " +
        "max |c1*n2 - c2*n1| (ECDF difference cross-multiplied clear of " +
        "both divisions). d_ppm = D_num*1e6 div (n1*n2); the alpha=0.05 " +
        "call compares D_num^2 * 1e6 > c^2_e6 * n1*n2*(n1+n2) with " +
        "c = 1.358 (c^2 micro-scaled = 1844164) — computed in " +
        "DECIMAL(38,0)/HUGEINT INTERNALLY (the square crosses int64 at " +
        "sf0.1) with only bigint/boolean EMITTED (the q208 rendering " +
        "rule). d_at_bucket = the smallest bucket achieving D (where " +
        "the distributions diverge most — the actionable bit). Plan: " +
        "one row-scale (bucket) aggregate with both arms as conditional " +
        "sums (one scan, q227's trick); running sums + max run on the " +
        "bounded bucket domain; output is one row.",
      (s, dir) => {
        import s.implicits._
        val g = Tables.t(s, dir, "events")
          .filter($"event_type" === "purchase")
          .select(($"user_id" % 2).as("arm"),
            expr("cast(round(value * 100) as bigint) div 100").as("bucket"))
          .groupBy($"bucket")
          .agg(sum(when($"arm" === 0, 1L).otherwise(0L)).as("c1"),
            sum(when($"arm" === 1, 1L).otherwise(0L)).as("c2"))
        ksStats(g, Nil)
      },
      Some("""
        WITH p AS (
          SELECT user_id % 2 AS arm,
                 CAST(round(value * 100) AS BIGINT) // 100 AS bucket
          FROM events WHERE event_type = 'purchase'),
        g AS (
          SELECT bucket,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
          FROM p GROUP BY 1),
        cum AS (
          SELECT bucket,
                 sum(c1) OVER (ORDER BY bucket
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS f1,
                 sum(c2) OVER (ORDER BY bucket
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS f2,
                 sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
          FROM g),
        d AS (
          SELECT bucket, n1, n2, abs(f1 * n2 - f2 * n1) AS diff,
                 max(abs(f1 * n2 - f2 * n1)) OVER () AS dmax
          FROM cum)
        SELECT CAST(min(n1) AS BIGINT) AS n1, CAST(min(n2) AS BIGINT) AS n2,
               CAST((min(dmax) * 1000000) // (min(n1) * min(n2)) AS BIGINT)
                 AS d_ppm,
               CAST(min(CASE WHEN diff = dmax THEN bucket END) AS BIGINT)
                 AS d_at_bucket,
               (CAST(min(dmax) AS HUGEINT) * min(dmax) * 1000000 >
                1844164 * CAST(min(n1) AS HUGEINT) * min(n2)
                        * (min(n1) + min(n2))) AS ks_reject_95
        FROM d""")),

    Q(
      "q244_bootstrap_ci",
      "DETERMINISTIC BOOTSTRAP CONFIDENCE INTERVAL for the mean purchase " +
        "amount — nonparametric uncertainty without ANY engine RNG: " +
        "B = 200 resamples of n draws-with-replacement, where draw " +
        "(b, j) picks sample index mix(b*1000003 + j) mod n with the " +
        "q204/q211 overflow-safe quadratic mix mod 2^31-1 — a fixed " +
        "integer recurrence both engines replay bit-for-bit, so the CI " +
        "is reproducible across engines, partitionings, and reruns " +
        "(rand()-based bootstrap is none of those). Sample ranks come " +
        "from the TWO-PHASE (cents-domain CDF + per-cents event_id " +
        "window) rank — q125's recipe, no single-partition row sort. " +
        "The 95% interval takes the 2.5/97.5 percentile resample means " +
        "by q168's counting rule over the 200-row mean domain. Plan: " +
        "the B x n grid is the one row-scale shuffle (grid joins ranks " +
        "on the drawn index); means combine map-side; at 100 TB swap " +
        "the explicit grid for a per-row deterministic-Poisson weight " +
        "column (Poisson bootstrap) and keep everything else.",
      (s, dir) => {
        import s.implicits._
        val M = 2147483647L
        val B = 200
        val p = Tables.t(s, dir, "events")
          .filter($"event_type" === "purchase")
          .select(expr("cast(round(value * 100) as bigint)").as("cents"),
            $"event_id")
        val cdf = p.groupBy($"cents").agg(count(lit(1)).as("cn"))
          .withColumn("cumBefore", coalesce(sum($"cn").over(
            Window.orderBy($"cents")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val ranked = p.join(cdf, Seq("cents"))
          .select($"cents",
            ($"cumBefore" + row_number().over(
              Window.partitionBy($"cents").orderBy($"event_id")) - 1)
              .as("rk"))
        val nRow = broadcast(p.agg(count(lit(1)).as("n")))
        val grid = ranked.select($"rk".as("j")).crossJoin(nRow)
          .crossJoin(broadcast(
            s.range(B).select($"id".as("b"))))
          .withColumn("s0", ($"b" * 1000003L + $"j") % M)
          .withColumn("idx", (($"s0" * $"s0" + $"s0" * 48271L) % M) % $"n")
        val means = grid.join(ranked.select($"rk".as("idx"), $"cents"),
            Seq("idx"))
          .groupBy($"b").agg(sum($"cents").as("tot"))
          .crossJoin(nRow)
          .select($"b", expr("tot div n").as("mean_cents"))
        val rankedMeans = means
          .withColumn("rn", row_number().over(
            Window.orderBy($"mean_cents", $"b"))) // 200-row domain
        rankedMeans
          .agg(
            min(when($"rn" * 1000 >= 25 * B, $"mean_cents")).as("ci_lo_cents"),
            min(when($"rn" * 1000 >= 975 * B, $"mean_cents")).as("ci_hi_cents"))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("n"),
            sum($"cents").as("tot"))))
          .select($"n", lit(B.toLong).as("b_resamples"),
            expr("tot div n").as("mean_cents"),
            $"ci_lo_cents", $"ci_hi_cents")
      },
      Some("""
        WITH p AS (
          SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id
          FROM events WHERE event_type = 'purchase'),
        t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS tot FROM p),
        ranked AS (
          SELECT cents,
                 CAST(row_number() OVER (ORDER BY cents, event_id) - 1
                   AS BIGINT) AS rk
          FROM p),
        grid AS (
          SELECT b.b, r.rk AS j,
                 ((b.b * 1000003 + r.rk) % 2147483647) AS s0
          FROM ranked r CROSS JOIN
               (SELECT unnest(range(200)) AS b) b),
        drawn AS (
          SELECT g.b,
                 ((g.s0 * g.s0 + g.s0 * 48271) % 2147483647) % t.n AS idx
          FROM grid g, t),
        means AS (
          SELECT d.b, CAST(sum(r.cents) // t.n AS BIGINT) AS mean_cents
          FROM drawn d JOIN ranked r ON r.rk = d.idx, t
          GROUP BY d.b, t.n),
        rm AS (
          SELECT b, mean_cents,
                 row_number() OVER (ORDER BY mean_cents, b) AS rn
          FROM means)
        SELECT t.n, CAST(200 AS BIGINT) AS b_resamples,
               CAST(t.tot // t.n AS BIGINT) AS mean_cents,
               CAST(min(CASE WHEN rn * 1000 >= 25 * 200
                             THEN mean_cents END) AS BIGINT) AS ci_lo_cents,
               CAST(min(CASE WHEN rn * 1000 >= 975 * 200
                             THEN mean_cents END) AS BIGINT) AS ci_hi_cents
        FROM rm, t GROUP BY t.n, t.tot""")),

    Q(
      "q251_position_attribution",
      "POSITION-BASED (U-SHAPED 40/20/40) ATTRIBUTION with EXACT credit " +
        "conservation — completes the attribution family (q210 " +
        "last-touch, q213 linear): the first and last click in a " +
        "purchase's 24 h lookback each take cents*40 div 100, the " +
        "middle touches share the remaining pool equally, and every " +
        "integer remainder lands deterministically (k=1 takes all; " +
        "k=2's pool goes to the last touch; the most recent middle " +
        "absorbs the middle remainder) — so sum(credit) == purchase " +
        "revenue TO THE CENT, the same invariant q213 proves for the " +
        "linear rule. Touch set, tie rule ((ts, event_id)), and organic " +
        "fallback are IDENTICAL to q213's — one recency-ranked window " +
        "over the same user-keyed join — so the three models are " +
        "comparable row for row. Plan: user-keyed equi-join with the " +
        "24 h residual, one purchase-keyed window for (k, rn), " +
        "map-side-combined channel totals.",
      (s, dir) => {
        import s.implicits._
        // rn=1 most recent, rn=k first — the shared touchUniverse rule
        val (p, j) = touchUniverse(s, dir)
        val credited = j
          .withColumn("c40", expr("(cents * 40) div 100"))
          .withColumn("pool", $"cents" - lit(2) * $"c40")
          .withColumn("mid", when($"k" > 2, expr("pool div (k - 2)")))
          .withColumn("credit",
            when($"k" === 1, $"cents")
              .when($"rn" === $"k", $"c40") // first touch
              .when($"k" === 2, $"c40" + $"pool") // last of two
              .when($"rn" === 1, $"c40") // last of >= 3
              .when($"rn" === 2,
                $"mid" + ($"pool" - ($"k" - 2) * $"mid")) // newest middle
              .otherwise($"mid"))
        val organic = p
          .join(j.select($"pid"), Seq("pid"), "left_anti")
          .select(lit("organic").as("channel"), $"cents".as("credit"))
        credited
          .select(concat(lit("ch"), $"ch").as("channel"), $"credit")
          .unionByName(organic)
          .groupBy($"channel")
          .agg(count(lit(1)).as("n_touches"), sum($"credit").as("credit_cents"))
          .orderBy($"channel")
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id AS pid, epoch_us(CAST(ts AS TIMESTAMP)) AS pus,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, event_id AS cid, epoch_us(CAST(ts AS TIMESTAMP)) AS cus,
                 CAST(json_extract(props, 'k') AS BIGINT) // 25 AS ch
          FROM events WHERE event_type = 'click'),
        j AS (
          SELECT p.pid, p.cents, c.ch,
                 count(*) OVER (PARTITION BY p.pid) AS k,
                 row_number() OVER (PARTITION BY p.pid
                                    ORDER BY c.cus DESC, c.cid DESC) AS rn
          FROM p JOIN c ON p.user_id = c.user_id
                       AND (c.cus < p.pus
                            OR (c.cus = p.pus AND c.cid < p.pid))
                       AND p.pus - c.cus <= 86400000000),
        cr AS (
          SELECT pid, ch,
                 (cents * 40) // 100 AS c40,
                 cents - 2 * ((cents * 40) // 100) AS pool,
                 CASE WHEN k > 2
                      THEN (cents - 2 * ((cents * 40) // 100)) // (k - 2)
                 END AS mid,
                 k, rn, cents
          FROM j),
        credited AS (
          SELECT 'ch' || CAST(ch AS VARCHAR) AS channel,
                 CASE WHEN k = 1 THEN cents
                      WHEN rn = k THEN c40
                      WHEN k = 2 THEN c40 + pool
                      WHEN rn = 1 THEN c40
                      WHEN rn = 2 THEN mid + (pool - (k - 2) * mid)
                      ELSE mid END AS credit
          FROM cr),
        organic AS (
          SELECT 'organic' AS channel, cents AS credit
          FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid))
        SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(credit) AS BIGINT) AS credit_cents
        FROM (SELECT * FROM credited UNION ALL SELECT * FROM organic)
        GROUP BY channel ORDER BY channel""")),

    Q(
      "q259_diff_in_diff",
      "DIFFERENCE-IN-DIFFERENCES estimator over the events table: " +
        "treated = user_id parity (q208's arm rule), period = event " +
        "day before/after the fixture's midpoint day ((min+max) div 2 " +
        "over epoch days — a closed-form split both engines compute " +
        "identically, no calendar constant baked in so every sf dir " +
        "works), outcome = mean purchase cents per (arm, period) cell. " +
        "DiD = (t_post - t_pre) - (c_post - c_pre) where each term is " +
        "the cell mean in MICRO-CENTS via exact integer floor " +
        "(sum*1e6 div n, HUGEINT/DECIMAL internally since sum*1e6 " +
        "crosses int64 beyond sf1; emitted BIGINT because the VALUE is " +
        "bounded by the price scale, not the data scale — unlike " +
        "q208's z2 the estimate itself does not grow with N, which is " +
        "why this query needs no string rendering). The four floors " +
        "compose deterministically on both engines, so the oracle is " +
        "bit-exact without carrying a 4-way common denominator that " +
        "would overflow DECIMAL(38) at cluster scale. Plan: one " +
        "row-scale aggregate to the 4-cell (arm, period) domain with " +
        "map-side partials + a broadcast 1-row min/max day frame — two " +
        "scalars of driver state, the same two-level shape at 100 TB.",
      (s, dir) => {
        import s.implicits._
        val p = Tables.t(s, dir, "events")
          .filter($"event_type" === "purchase")
          .select(($"user_id" % 2).as("treat"),
            expr("datediff(cast(ts as date), date '1970-01-01')").as("d"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
        val mid = broadcast(
          p.agg(expr("(min(d) + max(d)) div 2").as("mid")))
        p.crossJoin(mid)
          .select($"treat", ($"d" > $"mid").cast("int").as("post"), $"cents")
          .agg(
            sum(when($"treat" === 1 && $"post" === 1, $"cents")).as("s11"),
            count(when($"treat" === 1 && $"post" === 1, 1)).as("n11"),
            sum(when($"treat" === 1 && $"post" === 0, $"cents")).as("s10"),
            count(when($"treat" === 1 && $"post" === 0, 1)).as("n10"),
            sum(when($"treat" === 0 && $"post" === 1, $"cents")).as("s01"),
            count(when($"treat" === 0 && $"post" === 1, 1)).as("n01"),
            sum(when($"treat" === 0 && $"post" === 0, $"cents")).as("s00"),
            count(when($"treat" === 0 && $"post" === 0, 1)).as("n00"))
          .select(
            $"n11", $"n10", $"n01", $"n00",
            expr("cast(cast(s11 as decimal(38,0)) * 1000000 div n11 as bigint)")
              .as("t_post_micros"),
            expr("cast(cast(s10 as decimal(38,0)) * 1000000 div n10 as bigint)")
              .as("t_pre_micros"),
            expr("cast(cast(s01 as decimal(38,0)) * 1000000 div n01 as bigint)")
              .as("c_post_micros"),
            expr("cast(cast(s00 as decimal(38,0)) * 1000000 div n00 as bigint)")
              .as("c_pre_micros"))
          .withColumn("did_micros",
            ($"t_post_micros" - $"t_pre_micros") -
              ($"c_post_micros" - $"c_pre_micros"))
      },
      Some("""
        WITH p AS (
          SELECT user_id % 2 AS treat,
                 datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        m AS (SELECT (min(d) + max(d)) // 2 AS mid FROM p),
        cells AS (
          SELECT treat, CASE WHEN d > m.mid THEN 1 ELSE 0 END AS post, cents
          FROM p, m),
        a AS (
          SELECT
            CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN cents END) AS HUGEINT) AS s11,
            CAST(count(CASE WHEN treat = 1 AND post = 1 THEN 1 END) AS BIGINT) AS n11,
            CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN cents END) AS HUGEINT) AS s10,
            CAST(count(CASE WHEN treat = 1 AND post = 0 THEN 1 END) AS BIGINT) AS n10,
            CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN cents END) AS HUGEINT) AS s01,
            CAST(count(CASE WHEN treat = 0 AND post = 1 THEN 1 END) AS BIGINT) AS n01,
            CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN cents END) AS HUGEINT) AS s00,
            CAST(count(CASE WHEN treat = 0 AND post = 0 THEN 1 END) AS BIGINT) AS n00
          FROM cells),
        b AS (
          SELECT n11, n10, n01, n00,
                 CAST(s11 * 1000000 // n11 AS BIGINT) AS t_post_micros,
                 CAST(s10 * 1000000 // n10 AS BIGINT) AS t_pre_micros,
                 CAST(s01 * 1000000 // n01 AS BIGINT) AS c_post_micros,
                 CAST(s00 * 1000000 // n00 AS BIGINT) AS c_pre_micros
          FROM a)
        SELECT n11, n10, n01, n00,
               t_post_micros, t_pre_micros, c_post_micros, c_pre_micros,
               (t_post_micros - t_pre_micros)
                 - (c_post_micros - c_pre_micros) AS did_micros
        FROM b""")),

    Q(
      "q260_sequential_ab_monitor",
      "GROUP-SEQUENTIAL A/B MONITORING — q208's two-proportion z^2 run " +
        "as a BY-DAY interim-analysis schedule with a Pocock-style " +
        "constant boundary: per event day (ordered), the CUMULATIVE " +
        "(user, day)-unit counts per arm, the exact-rational z^2 at " +
        "that look (q208's cleared algebra: nn*d^2 vs n_a*n_b*C*(N-C) " +
        "carried in DECIMAL(38,0)), and cross_95 = z^2 > 2.89^2 (the " +
        "published Pocock critical value for ~20 equally-spaced looks " +
        "at overall alpha 0.05, micro-scaled 8352100) — the stricter " +
        "per-look bar that keeps the FAMILY-wise false-positive rate " +
        "at 5% where q208's single-look 3.841459 would inflate it ~25% " +
        "under daily peeking. first_cross marks the earliest day the " +
        "boundary is crossed: the ship/stop decision row. Plan: one " +
        "row-scale aggregate to (day, arm-conditional unit counts) " +
        "with map-side partials; cumulative sums + the decimal compare " +
        "run as windows over the bounded ~30-row day domain (q199's " +
        "bucket-domain argument) — the same plan at 100 TB, and the " +
        "monitor is incrementally maintainable because each look only " +
        "ADDS a day to the cumsum (q151's argument).",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.t(s, dir, "events")
          .groupBy(($"user_id" % 2).as("arm"), $"user_id",
            date_trunc("DAY", $"ts").as("day"))
          .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("conv"))
          .groupBy($"day")
          .agg(
            sum(when($"arm" === 0, 1L).otherwise(0L)).as("da"),
            sum(when($"arm" === 0, $"conv").otherwise(0L)).as("dca"),
            sum(when($"arm" === 1, 1L).otherwise(0L)).as("db"),
            sum(when($"arm" === 1, $"conv").otherwise(0L)).as("dcb"))
        val w = Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val looks = daily
          .select($"day",
            sum($"da").over(w).as("n_a"), sum($"dca").over(w).as("c_a"),
            sum($"db").over(w).as("n_b"), sum($"dcb").over(w).as("c_b"))
          .withColumn("d",
            expr("cast(c_a as decimal(38,0)) * n_b - cast(c_b as decimal(38,0)) * n_a"))
          .withColumn("cc", expr("cast(c_a + c_b as decimal(38,0))"))
          .withColumn("nn", expr("cast(n_a + n_b as decimal(38,0))"))
          .withColumn("den",
            expr("cast(cast(n_a as decimal(38,0)) * n_b * cc * (nn - cc) as decimal(38,0))"))
          .withColumn("cross_95",
            expr("n_a > 0 and n_b > 0 and cc > 0 and nn - cc > 0 and " +
              "nn * d * d * 1000000 > 8352100 * den"))
        looks
          .withColumn("first_cross",
            $"cross_95" &&
              coalesce(max($"cross_95".cast("int")).over(
                Window.orderBy($"day")
                  .rowsBetween(Window.unboundedPreceding, -1)), lit(0))
                === 0)
          .select($"day".cast("date").as("day"),
            $"n_a", $"c_a", $"n_b", $"c_b",
            expr("case when den > 0 then cast(nn * d * d * 1000000 div den as bigint) end")
              .as("z2_micro"),
            $"cross_95", $"first_cross")
          .orderBy($"day")
      },
      Some("""
        WITH u AS (
          SELECT user_id % 2 AS arm, user_id, date_trunc('day', ts) AS day,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          FROM events GROUP BY 1, 2, 3),
        daily AS (
          SELECT day,
                 sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS da,
                 sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS dca,
                 sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS db,
                 sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS dcb
          FROM u GROUP BY 1),
        looks AS (
          SELECT day,
                 CAST(sum(da) OVER w AS BIGINT) AS n_a,
                 CAST(sum(dca) OVER w AS BIGINT) AS c_a,
                 CAST(sum(db) OVER w AS BIGINT) AS n_b,
                 CAST(sum(dcb) OVER w AS BIGINT) AS c_b
          FROM daily
          WINDOW w AS (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        z AS (
          SELECT day, n_a, c_a, n_b, c_b,
                 CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a AS d,
                 CAST(c_a + c_b AS HUGEINT) AS cc,
                 CAST(n_a + n_b AS HUGEINT) AS nn,
                 CAST(n_a AS HUGEINT) * n_b * (c_a + c_b)
                   * (n_a + n_b - c_a - c_b) AS den
          FROM looks),
        c AS (
          SELECT day, n_a, c_a, n_b, c_b,
                 CASE WHEN den > 0
                      THEN CAST(nn * d * d * 1000000 // den AS BIGINT) END
                   AS z2_micro,
                 (n_a > 0 AND n_b > 0 AND cc > 0 AND nn - cc > 0
                  AND nn * d * d * 1000000 > 8352100 * den) AS cross_95
          FROM z)
        SELECT CAST(day AS DATE) AS day, n_a, c_a, n_b, c_b, z2_micro,
               cross_95,
               (cross_95 AND coalesce(max(CASE WHEN cross_95 THEN 1 ELSE 0 END)
                  OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) = 0) AS first_cross
        FROM c ORDER BY day""")),

    Q(
      "q265_ips_policy_eval",
      "OFF-POLICY EVALUATION by inverse-propensity scoring: estimate the " +
        "conversion rate a TARGET recommendation policy (pi(user) = " +
        "user_id % 4, a personalized channel assignment) WOULD achieve, " +
        "from clicks logged under the production mix — the " +
        "counterfactual question every recommender change answers " +
        "offline before an A/B slot opens. Propensities are the " +
        "EMPIRICAL channel frequencies (props.k div 25 is NOT uniform — " +
        "k stops at 95, so channel 3 has 21/96 of the mass; assuming " +
        "1/4 would bias the estimate upward on ch3), and the empirical-" +
        "propensity IPS sum collapses algebraically to an exact " +
        "rational: sum_i 1[ch_i = pi(u_i)] r_i / (n_ch/n) / n = " +
        "sum_ch conv_matched_ch / n_ch — no floats anywhere. Reward = " +
        "the click converts (a purchase by the same user within 24 h, " +
        "strictly after). Emitted per channel: logged/matched/converted " +
        "counts, the IPS term in ppm, plus the policy-value total and " +
        "the observed baseline for lift reading. Plan: one user-keyed " +
        "LEFT SEMI join decides conversion (the only row-scale " +
        "shuffle — at 100 TB it becomes the q225 banded as-of form), " +
        "then aggregates to the 4-channel domain; windows run on 4 rows.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select($"user_id", $"event_type", $"event_id",
            unix_micros($"ts".cast("timestamp")).as("us"),
            expr("cast(get_json_object(props, '$.k') as bigint) div 25")
              .as("ch"))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id", $"us", $"ch",
            ($"ch" === $"user_id" % 4).as("matched"))
        val purch = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"us".as("p_us"))
        val converted = clicks.join(purch,
            $"user_id" === $"p_user" && $"p_us" > $"us" &&
              $"p_us" - $"us" <= 86400000000L, "left_semi")
          .groupBy($"ch")
          .agg(count(lit(1)).as("conv_all"),
            sum($"matched".cast("long")).as("conv_matched"))
        val logged = clicks.groupBy($"ch")
          .agg(count(lit(1)).as("n_logged"),
            sum($"matched".cast("long")).as("n_matched"))
        val w = Window.partitionBy() // 4-channel domain
        logged.join(converted, Seq("ch"))
          .select($"ch", $"n_logged", $"n_matched", $"conv_all",
            $"conv_matched",
            expr("(conv_matched * 1000000) div n_logged").as("ips_term_ppm"))
          .withColumn("ips_value_ppm", sum($"ips_term_ppm").over(w))
          .withColumn("tot_conv", sum($"conv_all").over(w))
          .withColumn("tot_logged", sum($"n_logged").over(w))
          .withColumn("obs_conv_ppm",
            expr("(tot_conv * 1000000) div tot_logged"))
          .drop("tot_conv", "tot_logged")
          .orderBy($"ch")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(json_extract(props, 'k') AS BIGINT) // 25 AS ch
          FROM events),
        clicks AS (
          SELECT user_id, event_id, us, ch,
                 (ch = user_id % 4) AS matched
          FROM e WHERE event_type = 'click'),
        conv AS (
          SELECT ch,
                 CAST(count(*) AS BIGINT) AS conv_all,
                 CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
                   AS conv_matched
          FROM clicks c
          WHERE EXISTS (SELECT 1 FROM e p
                        WHERE p.event_type = 'purchase'
                          AND p.user_id = c.user_id
                          AND p.us > c.us
                          AND p.us - c.us <= 86400000000)
          GROUP BY ch),
        logged AS (
          SELECT ch, CAST(count(*) AS BIGINT) AS n_logged,
                 CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matched
          FROM clicks GROUP BY ch),
        terms AS (
          SELECT l.ch, l.n_logged, l.n_matched, c.conv_all, c.conv_matched,
                 (c.conv_matched * 1000000) // l.n_logged AS ips_term_ppm
          FROM logged l JOIN conv c USING (ch))
        SELECT ch, n_logged, n_matched, conv_all, conv_matched, ips_term_ppm,
               CAST(sum(ips_term_ppm) OVER () AS BIGINT) AS ips_value_ppm,
               CAST((sum(conv_all) OVER () * 1000000)
                    // sum(n_logged) OVER () AS BIGINT) AS obs_conv_ppm
        FROM terms ORDER BY ch""")),

    Q(
      "q269_bandit_replay",
      "GREEDY-BANDIT REPLAY with hindsight regret — the SEQUENTIAL " +
        "decision loop q265's one-shot IPS estimate feeds (IPS values a " +
        "fixed policy; this replays the adaptive one a traffic " +
        "allocator actually runs): each day, an optimistic-greedy " +
        "policy picks the channel with the best CUMULATIVE-so-far " +
        "click-to-conversion rate (never-pulled arms score an " +
        "optimistic 1000001 ppm, forcing one exploration pull each; " +
        "rate ties break to the lower channel id — every decision is a " +
        "deterministic integer argmax, NO RNG, which is what makes the " +
        "whole replay oracle-able), and the day's realized rates are " +
        "read from the log for both the picked arm and the best FIXED " +
        "arm in hindsight. cum_regret_micro accumulates the daily " +
        "rate gap — the curve that shows greedy locking onto the " +
        "leader and the gap flattening. Plan: one row-scale aggregate " +
        "to the (day, channel) domain (map-side partials); every " +
        "window after that — per-channel cumsums, per-day argmax, the " +
        "regret cumsum — runs on the bounded ~31x4 grid. Same plan at " +
        "100 TB; the decision table IS the bounded domain.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select($"user_id", $"event_type", $"event_id",
            unix_micros($"ts".cast("timestamp")).as("us"),
            to_date($"ts").as("day"),
            expr("cast(get_json_object(props, '$.k') as bigint) div 25")
              .as("ch"))
        val clicks = ev.filter($"event_type" === "click")
        val purch = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_user"), $"us".as("p_us"))
        val conv = clicks.join(purch,
          $"user_id" === $"p_user" && $"p_us" > $"us" &&
            $"p_us" - $"us" <= 86400000000L, "left_semi")
        val daily = clicks.groupBy($"day", $"ch")
          .agg(count(lit(1)).as("n"))
          .join(conv.groupBy($"day", $"ch").agg(count(lit(1)).as("c")),
            Seq("day", "ch"), "left")
          .na.fill(0L, Seq("c"))
          // four consumers (days, arms, grid, bestFixed) — materialize the
          // row-scale semi-join ONCE or each replays the 24 h probe
          // (measured 24.7 s -> ~6 s at the 6M-event stress scale)
          .localCheckpoint(true)
        // dense (day x ch) grid so a channel with zero clicks on a day
        // still exists as an arm (rate 0), keeping both engines' argmax
        // domains identical
        val days = daily.select($"day").distinct()
        val arms = daily.select($"ch").distinct()
        val grid = days.crossJoin(broadcast(arms))
          .join(daily, Seq("day", "ch"), "left").na.fill(0L, Seq("n", "c"))
        val wCum = Window.partitionBy($"ch").orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, -1)
        val scored = grid
          .withColumn("cn", coalesce(sum($"n").over(wCum), lit(0L)))
          .withColumn("cc", coalesce(sum($"c").over(wCum), lit(0L)))
          .withColumn("score_ppm",
            expr("case when cn = 0 then 1000001 " +
              "else (cc * 1000000) div cn end"))
          .withColumn("day_rate_ppm",
            expr("case when n = 0 then 0 else (c * 1000000) div n end"))
        val picked = scored
          .withColumn("rn", row_number().over(
            Window.partitionBy($"day").orderBy($"score_ppm".desc, $"ch")))
          .filter($"rn" === 1)
          .select($"day", $"ch".as("picked_ch"),
            $"score_ppm".as("picked_score_ppm"),
            $"day_rate_ppm".as("picked_day_rate_ppm"))
        val bestFixed = broadcast(daily
          .groupBy($"ch").agg(sum($"n").as("tn"), sum($"c").as("tc"))
          .select($"ch", expr("(tc * 1000000) div tn").as("fixed_ppm"))
          .orderBy($"fixed_ppm".desc, $"ch").limit(1)
          .select($"ch".as("best_fixed_ch")))
        val bestDaily = scored.join(bestFixed, $"ch" === $"best_fixed_ch")
          .select($"day", $"best_fixed_ch",
            $"day_rate_ppm".as("best_day_rate_ppm"))
        picked.join(bestDaily, Seq("day"))
          .withColumn("cum_regret_micro",
            sum($"best_day_rate_ppm" - $"picked_day_rate_ppm").over(
              Window.orderBy($"day").rowsBetween(
                Window.unboundedPreceding, Window.currentRow)))
          .select($"day", $"picked_ch", $"picked_score_ppm",
            $"picked_day_rate_ppm", $"best_fixed_ch",
            $"best_day_rate_ppm", $"cum_regret_micro")
          .orderBy($"day")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(ts AS DATE) AS day,
                 CAST(json_extract(props, 'k') AS BIGINT) // 25 AS ch
          FROM events),
        clicks AS (SELECT * FROM e WHERE event_type = 'click'),
        p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
        daily AS (
          SELECT c.day, c.ch,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN EXISTS (
                        SELECT 1 FROM p WHERE p.user_id = c.user_id
                          AND p.us > c.us
                          AND p.us - c.us <= 86400000000)
                      THEN 1 ELSE 0 END) AS BIGINT) AS c
          FROM clicks c GROUP BY 1, 2),
        grid AS (
          SELECT d.day, a.ch, coalesce(x.n, 0) AS n, coalesce(x.c, 0) AS c
          FROM (SELECT DISTINCT day FROM daily) d
          CROSS JOIN (SELECT DISTINCT ch FROM daily) a
          LEFT JOIN daily x ON x.day = d.day AND x.ch = a.ch),
        scored AS (
          SELECT day, ch, n, c,
                 coalesce(sum(n) OVER w, 0) AS cn,
                 coalesce(sum(c) OVER w, 0) AS cc
          FROM grid
          WINDOW w AS (PARTITION BY ch ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        sc2 AS (
          SELECT day, ch, n, c,
                 CASE WHEN cn = 0 THEN 1000001
                      ELSE (cc * 1000000) // cn END AS score_ppm,
                 CASE WHEN n = 0 THEN 0
                      ELSE (c * 1000000) // n END AS day_rate_ppm
          FROM scored),
        picked AS (
          SELECT day, ch AS picked_ch, score_ppm AS picked_score_ppm,
                 day_rate_ppm AS picked_day_rate_ppm
          FROM (SELECT *, row_number() OVER (PARTITION BY day
                  ORDER BY score_ppm DESC, ch) AS rn FROM sc2)
          WHERE rn = 1),
        best AS (
          SELECT ch AS best_fixed_ch FROM daily
          GROUP BY ch
          ORDER BY (sum(c) * 1000000) // sum(n) DESC, ch LIMIT 1),
        bestd AS (
          SELECT s.day, b.best_fixed_ch, s.day_rate_ppm AS best_day_rate_ppm
          FROM sc2 s JOIN best b ON s.ch = b.best_fixed_ch)
        SELECT p.day,
               CAST(p.picked_ch AS BIGINT) AS picked_ch,
               CAST(p.picked_score_ppm AS BIGINT) AS picked_score_ppm,
               CAST(p.picked_day_rate_ppm AS BIGINT) AS picked_day_rate_ppm,
               CAST(b.best_fixed_ch AS BIGINT) AS best_fixed_ch,
               CAST(b.best_day_rate_ppm AS BIGINT) AS best_day_rate_ppm,
               CAST(sum(b.best_day_rate_ppm - p.picked_day_rate_ppm)
                 OVER (ORDER BY p.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_regret_micro
        FROM picked p JOIN bestd b USING (day)
        ORDER BY p.day""")),

    Q(
      "q284_time_decay_attribution",
      "TIME-DECAY ATTRIBUTION with EXACT credit conservation — the " +
        "fourth member of the attribution family (q210 last-touch, " +
        "q213 linear, q251 position): each touch's weight HALVES per " +
        "6 h of age (w = 8,4,2,1 for the four 6 h buckets of the 24 h " +
        "lookback — a power-of-two half-life, so every weight is an " +
        "exact integer and no engine computes exp()), credit = " +
        "cents*w div sum(w) with the remainder to the most recent " +
        "touch, organic purchases credit in full — sum(credit) == " +
        "revenue TO THE CENT, the family invariant. Touch set and tie " +
        "rule come from the SAME shared touchUniverse as the other " +
        "models (age_us is the one added column), so all four credit " +
        "rules are comparable row for row. Plan: identical to q213's — " +
        "user-keyed join, one pid-keyed window pass (the weight sums " +
        "share q213's exchange), map-side-combined channel totals.",
      (s, dir) => {
        import s.implicits._
        val (p, j) = touchUniverse(s, dir)
        val wp = Window.partitionBy($"pid")
        val credited = j
          // least(...,3) folds the age == 24 h boundary into the last
          // bucket instead of shifting the weight to zero
          .withColumn("w", expr("case least(age_us div 21600000000, 3) " +
            "when 0 then 8 when 1 then 4 when 2 then 2 else 1 end"))
          .withColumn("sw", sum($"w").over(wp))
          .withColumn("base", expr("(cents * w) div sw"))
          .withColumn("rem", $"cents" - sum($"base").over(wp))
          .select(concat(lit("ch"), $"ch").as("channel"),
            ($"base" + when($"rn" === 1, $"rem").otherwise(0L)).as("credit"))
        val organic = p
          .join(j.select($"pid"), Seq("pid"), "left_anti")
          .select(lit("organic").as("channel"), $"cents".as("credit"))
        credited.unionByName(organic)
          .groupBy($"channel")
          .agg(count(lit(1)).as("n_touches"), sum($"credit").as("credit_cents"))
          .orderBy($"channel")
      },
      Some("""
        WITH p AS (
          SELECT user_id, event_id AS pid, epoch_us(CAST(ts AS TIMESTAMP)) AS pus,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        c AS (
          SELECT user_id, event_id AS cid, epoch_us(CAST(ts AS TIMESTAMP)) AS cus,
                 CAST(json_extract(props, 'k') AS BIGINT) // 25 AS ch
          FROM events WHERE event_type = 'click'),
        j AS (
          SELECT p.pid, p.cents, c.ch, p.pus - c.cus AS age_us,
                 row_number() OVER (PARTITION BY p.pid
                                    ORDER BY c.cus DESC, c.cid DESC) AS rn
          FROM p JOIN c ON p.user_id = c.user_id
                       AND (c.cus < p.pus
                            OR (c.cus = p.pus AND c.cid < p.pid))
                       AND p.pus - c.cus <= 86400000000),
        wt AS (
          SELECT pid, cents, ch, rn,
                 CASE least(age_us // 21600000000, 3)
                      WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2
                      ELSE 1 END AS w
          FROM j),
        base AS (
          SELECT pid, ch, rn, cents,
                 (cents * w) // sum(w) OVER (PARTITION BY pid) AS base
          FROM wt),
        alloc AS (
          SELECT pid, ch, rn, cents, base,
                 sum(base) OVER (PARTITION BY pid) AS allocated
          FROM base),
        credited AS (
          SELECT 'ch' || CAST(ch AS VARCHAR) AS channel,
                 base + CASE WHEN rn = 1 THEN cents - allocated
                             ELSE 0 END AS credit
          FROM alloc),
        organic AS (
          SELECT 'organic' AS channel, cents AS credit
          FROM p WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid))
        SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(credit) AS BIGINT) AS credit_cents
        FROM (SELECT * FROM credited UNION ALL SELECT * FROM organic)
        GROUP BY channel ORDER BY channel""")),

    Q(
      "q289_fdr_bh",
      "BENJAMINI-HOCHBERG FDR CONTROL over the per-channel A/B grid — " +
        "the multiple-testing closure of the family (q208 one test, " +
        "q260 one test over time, this: m=4 simultaneous tests): " +
        "q208's cleared z^2 algebra per exposure channel (unit = " +
        "(user, day) that CLICKED the channel; conversion = that unit " +
        "purchased), the rational z^2 projected to integer micros by " +
        "one DECIMAL division (identical truncation both engines, so " +
        "ordering and threshold compares agree bit-for-bit), then the " +
        "BH step-up on the 4-row test domain: rank by z^2 descending " +
        "(= p ascending), compare rank k against the chi2_1 quantile " +
        "at alpha*k/m (0.05*k/4 — the four critical values enter as " +
        "fixed micro literals, 6-dp-rounded public constants; no " +
        "engine inverts a CDF), reject every rank <= the LARGEST " +
        "passing rank — the step-up rule that dominates Bonferroni " +
        "(also emitted for contrast). Plan: one row-scale " +
        "(ch, arm, user, day) aggregate; ranks, thresholds and the " +
        "k* fold are windows over the 4-row domain.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
        val exp = ev.filter($"event_type" === "click")
          .select(
            expr("cast(get_json_object(props, '$.k') as bigint) div 25")
              .as("ch"),
            ($"user_id" % 2).as("arm"), $"user_id",
            date_trunc("DAY", $"ts").as("day"))
          .distinct()
        val conv = ev.filter($"event_type" === "purchase")
          .select($"user_id", date_trunc("DAY", $"ts").as("day"))
          .distinct().withColumn("conv", lit(1L))
        val perCh = exp.join(conv, Seq("user_id", "day"), "left")
          .na.fill(0L, Seq("conv"))
          .groupBy($"ch").agg(
            sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when($"arm" === 0, $"conv").otherwise(0L)).as("c_a"),
            sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when($"arm" === 1, $"conv").otherwise(0L)).as("c_b"))
        val ranked = perCh
          .withColumn("d", expr("cast(c_a as decimal(38,0)) * n_b " +
            "- cast(c_b as decimal(38,0)) * n_a"))
          .withColumn("cc", expr("cast(c_a + c_b as decimal(38,0))"))
          .withColumn("nn", expr("cast(n_a + n_b as decimal(38,0))"))
          .withColumn("den", expr("cast(cast(n_a as decimal(38,0)) " +
            "* n_b * cc * (nn - cc) as decimal(38,0))"))
          .withColumn("z2_micro",
            expr("cast((nn * d * d * 1000000) div den as bigint)"))
          // 4-row test domain: the unpartitioned rank is bounded by the
          // channel domain, never by rows
          .withColumn("rank", row_number()
            .over(Window.orderBy($"z2_micro".desc, $"ch")).cast("long"))
          .withColumn("crit_micro",
            expr("cast(element_at(array(6238533, 5023886, 4326700, " +
              "3841459), cast(rank as int)) as bigint)"))
          .withColumn("pass", $"z2_micro" >= $"crit_micro")
        val kstar = ranked.agg(max(when($"pass", $"rank")).as("kstar"))
        ranked.crossJoin(broadcast(kstar))
          .select($"ch", $"n_a", $"c_a", $"n_b", $"c_b", $"z2_micro",
            $"rank", $"crit_micro",
            ($"rank" <= coalesce($"kstar", lit(0L))).as("reject_bh"),
            ($"z2_micro" >= 6238533L).as("reject_bonferroni"))
          .orderBy($"ch")
      },
      Some("""
        WITH exp AS (
          SELECT DISTINCT CAST(json_extract(props, 'k') AS BIGINT) // 25
                   AS ch,
                 user_id % 2 AS arm, user_id, date_trunc('day', ts) AS day
          FROM events WHERE event_type = 'click'),
        cv AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day, 1 AS conv
          FROM events WHERE event_type = 'purchase'),
        u AS (
          SELECT e.ch, e.arm, coalesce(c.conv, 0) AS conv
          FROM exp e LEFT JOIN cv c
            ON e.user_id = c.user_id AND e.day = c.day),
        a AS (
          SELECT ch,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                   AS c_a,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                   AS c_b
          FROM u GROUP BY ch),
        b AS (
          SELECT ch, n_a, c_a, n_b, c_b,
                 CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a
                   AS d,
                 CAST(c_a + c_b AS HUGEINT) AS cc,
                 CAST(n_a + n_b AS HUGEINT) AS nn
          FROM a),
        z AS (
          SELECT ch, n_a, c_a, n_b, c_b,
                 CAST((nn * d * d * 1000000)
                      // (CAST(n_a AS HUGEINT) * n_b * cc * (nn - cc))
                   AS BIGINT) AS z2_micro
          FROM b),
        r AS (
          SELECT *, CAST(row_number() OVER (ORDER BY z2_micro DESC, ch)
                      AS BIGINT) AS rank
          FROM z),
        c AS (
          SELECT *, CAST(([6238533, 5023886, 4326700, 3841459])[rank]
                      AS BIGINT) AS crit_micro
          FROM r),
        k AS (SELECT max(CASE WHEN z2_micro >= crit_micro THEN rank END)
                AS kstar FROM c)
        SELECT ch, n_a, c_a, n_b, c_b, z2_micro, rank, crit_micro,
               rank <= coalesce(k.kstar, 0) AS reject_bh,
               z2_micro >= 6238533 AS reject_bonferroni
        FROM c, k ORDER BY ch""")),

    Q(
      "q291_power_analysis",
      "EXPERIMENT POWER ANALYSIS — the question asked BEFORE q208 runs: " +
        "at the observed baseline conversion rate, how many units per " +
        "arm does detecting a 5/10/20% relative lift take at 80% power " +
        "and alpha=0.05? Classic two-proportion approximation " +
        "n = (z_{a/2}+z_b)^2 * 2p(1-p) / (p*r)^2, ALGEBRAICALLY " +
        "SIMPLIFIED so p's denominator cancels: with p = c/n the whole " +
        "expression collapses to 2*K*(n-c)*10^12 / (c*r_ppm^2) — " +
        "integer arithmetic end to end ((2.801585)^2 enters as the " +
        "single micro literal 7848879; no engine touches a normal CDF) " +
        "— carried in DECIMAL(38,0) internally (the numerator crosses " +
        "int64 at stress scale) and emitted as BIGINT via ceil " +
        "division. Per lift row: required n per arm, available n " +
        "(min of the two arms), and the powered verdict. Plan: q208's " +
        "(arm, user, day) unit aggregate — the only row-scale shuffle " +
        "— then a 3-row lift-grid cross join on one summary row.",
      (s, dir) => {
        import s.implicits._
        val units = Tables.t(s, dir, "events")
          .groupBy(($"user_id" % 2).as("arm"), $"user_id",
            date_trunc("DAY", $"ts").as("day"))
          .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val summary = units.agg(
          sum(lit(1L)).as("n"), sum($"conv").as("c"),
          sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"))
        // grid: 50000, 100000, 200000 ppm = 5% / 10% / 20% relative
        val lifts = Seq(50000L, 100000L, 200000L).toDF("r_ppm")
        summary.crossJoin(broadcast(lifts))
          .select($"r_ppm",
            expr("(c * 10000) div n").as("base_rate_bp"),
            expr("cast(least(n_a, n_b) as bigint)").as("n_avail"),
            // ceil division in decimal: (num + den - 1) div den
            expr("cast((cast(2 as decimal(38,0)) * 7848879 * (n - c) " +
              "* 1000000000000 + cast(c as decimal(38,0)) * r_ppm * r_ppm " +
              "- 1) div (cast(c as decimal(38,0)) * r_ppm * r_ppm) " +
              "as bigint)").as("n_req"))
          .withColumn("powered", $"n_avail" >= $"n_req")
          .orderBy($"r_ppm")
      },
      Some("""
        WITH u AS (
          SELECT user_id % 2 AS arm, user_id, date_trunc('day', ts) AS day,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM events GROUP BY 1, 2, 3),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(conv) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
          FROM u),
        g AS (SELECT unnest([50000, 100000, 200000]) AS r_ppm)
        SELECT CAST(g.r_ppm AS BIGINT) AS r_ppm,
               (a.c * 10000) // a.n AS base_rate_bp,
               least(a.n_a, a.n_b) AS n_avail,
               CAST((CAST(2 AS HUGEINT) * 7848879 * (a.n - a.c)
                     * 1000000000000
                     + CAST(a.c AS HUGEINT) * g.r_ppm * g.r_ppm - 1)
                    // (CAST(a.c AS HUGEINT) * g.r_ppm * g.r_ppm)
                 AS BIGINT) AS n_req,
               least(a.n_a, a.n_b) >=
                 CAST((CAST(2 AS HUGEINT) * 7848879 * (a.n - a.c)
                       * 1000000000000
                       + CAST(a.c AS HUGEINT) * g.r_ppm * g.r_ppm - 1)
                      // (CAST(a.c AS HUGEINT) * g.r_ppm * g.r_ppm)
                   AS BIGINT) AS powered
        FROM a, g ORDER BY r_ppm""")),

    Q(
      "q293_aa_calibration",
      "A/A CALIBRATION HARNESS — the self-test a statistics engine " +
        "runs before anyone trusts q208: 20 deterministic " +
        "pseudo-experiments that split the SAME population by 20 " +
        "different user-hash mixes (no real treatment exists, so every " +
        "rejection is a FALSE positive), each scored by q208's exact " +
        "z^2 algebra; a calibrated test rejects ~5% of them at " +
        "alpha=0.05 (measured 0/20 at sf0.01, all 20 z^2 distinct). " +
        "No RNG: user ids are first SCRAMBLED to the full modulus " +
        "range (u*1103515245+12345 mod M) and only then hit the " +
        "per-seed multiplier — the parity of an LCG is FRAGILE when " +
        "inputs are small (without a mod wrap, an even per-seed delta " +
        "preserves every user's parity and 20 'independent' splits " +
        "silently collapse to ONE; the first cut of this query " +
        "returned 20 identical z^2 values exactly that way), so the " +
        "scramble is what buys the avalanche. Replays " +
        "bit-identically on both engines. The " +
        "(user, day) unit table aggregates ONCE from rows; the x20 " +
        "seed expansion explodes the UNIT table (never raw events) and " +
        "collapses map-side to 40 (seed, arm) cells — at 100 TB the " +
        "simulation costs one unit aggregate plus a 20x domain pass.",
      (s, dir) => {
        import s.implicits._
        val u = Tables.t(s, dir, "events")
          .groupBy($"user_id", date_trunc("DAY", $"ts").as("day"))
          .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val per = u
          .withColumn("seed", explode(expr("sequence(0, 19)")))
          .withColumn("arm", expr("(((user_id * 1103515245 + 12345) " +
            "% 2147483647) * (48271 + 2 * cast(seed as bigint))) " +
            "% 2147483647 % 2"))
          .groupBy($"seed").agg(
            sum(when($"arm" === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when($"arm" === 0, $"conv").otherwise(0L)).as("c_a"),
            sum(when($"arm" === 1, 1L).otherwise(0L)).as("n_b"),
            sum(when($"arm" === 1, $"conv").otherwise(0L)).as("c_b"))
        per
          .withColumn("d", expr("cast(c_a as decimal(38,0)) * n_b " +
            "- cast(c_b as decimal(38,0)) * n_a"))
          .withColumn("cc", expr("cast(c_a + c_b as decimal(38,0))"))
          .withColumn("nn", expr("cast(n_a + n_b as decimal(38,0))"))
          .withColumn("den", expr("cast(cast(n_a as decimal(38,0)) " +
            "* n_b * cc * (nn - cc) as decimal(38,0))"))
          .withColumn("z2_micro",
            expr("cast((nn * d * d * 1000000) div den as bigint)"))
          .agg(count(lit(1)).as("n_sims"),
            sum(when($"z2_micro" >= 3841459L, 1L).otherwise(0L))
              .as("n_reject"),
            min($"z2_micro").as("min_z2_micro"),
            max($"z2_micro").as("max_z2_micro"))
          .withColumn("reject_rate_bp",
            expr("(n_reject * 10000) div n_sims"))
      },
      Some("""
        WITH u AS (
          SELECT user_id, date_trunc('day', ts) AS day,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM events GROUP BY 1, 2),
        sim AS (
          SELECT s.seed,
                 (((u.user_id * 1103515245 + 12345) % 2147483647)
                  * (48271 + 2 * s.seed)) % 2147483647 % 2 AS arm,
                 u.conv
          FROM u CROSS JOIN (SELECT unnest(range(0, 20)) AS seed) s),
        a AS (
          SELECT seed,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
                 CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                   AS c_a,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
                 CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                   AS c_b
          FROM sim GROUP BY seed),
        z AS (
          SELECT seed,
                 CAST((CAST(n_a + n_b AS HUGEINT)
                       * (CAST(c_a AS HUGEINT) * n_b
                          - CAST(c_b AS HUGEINT) * n_a)
                       * (CAST(c_a AS HUGEINT) * n_b
                          - CAST(c_b AS HUGEINT) * n_a) * 1000000)
                      // (CAST(n_a AS HUGEINT) * n_b
                          * CAST(c_a + c_b AS HUGEINT)
                          * (CAST(n_a + n_b AS HUGEINT) - c_a - c_b))
                   AS BIGINT) AS z2_micro
          FROM a)
        SELECT count(*) AS n_sims,
               CAST(sum(CASE WHEN z2_micro >= 3841459 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_reject,
               CAST(min(z2_micro) AS BIGINT) AS min_z2_micro,
               CAST(max(z2_micro) AS BIGINT) AS max_z2_micro,
               (CAST(sum(CASE WHEN z2_micro >= 3841459 THEN 1 ELSE 0 END)
                 AS BIGINT) * 10000) // count(*) AS reject_rate_bp
        FROM z""")),

    Q(
      "q298_cmh_stratified",
      "COCHRAN-MANTEL-HAENSZEL STRATIFIED TEST — the Simpson's-paradox " +
        "defense the pooled q208 lacks: if traffic mix shifts by day, " +
        "a pooled 2x2 can show an effect that no day exhibits (or hide " +
        "one every day shows); CMH tests the arm effect WITHIN each " +
        "day stratum and combines evidence across the K=30 strata. " +
        "chi2_CMH = (sum_k a_k - sum_k E_k)^2 / sum_k V_k with " +
        "E_k = n1k*m1k/N_k and V_k = n1k*n0k*m1k*m0k/(N_k^2 (N_k-1)), " +
        "carried as DECIMAL-internal fixed-point micros (per-stratum " +
        "integer division, identical truncation both engines — q289's " +
        "projection convention; V_k's numerator crosses int64 at " +
        "sf0.1, hence decimal). The pooled q208 z^2 lands in the same " +
        "row, so the stratified-vs-pooled divergence — the paradox " +
        "detector — is one subtraction at readout. Plan: one " +
        "(day, arm, user) row-scale aggregate, a 30-row stratum frame, " +
        "O(1) reductions.",
      (s, dir) => {
        import s.implicits._
        val units = Tables.t(s, dir, "events")
          .groupBy(($"user_id" % 2).as("arm"), $"user_id",
            date_trunc("DAY", $"ts").as("day"))
          .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("conv"))
        val strata = units.groupBy($"day").agg(
          sum(when($"arm" === 0, 1L).otherwise(0L)).as("n1"),
          sum(when($"arm" === 1, 1L).otherwise(0L)).as("n0"),
          sum(when($"arm" === 0, $"conv").otherwise(0L)).as("a"),
          sum($"conv").as("m1"))
          .withColumn("nk", $"n1" + $"n0")
          .withColumn("m0", $"nk" - $"m1")
          .withColumn("e_micro", expr("cast((cast(n1 as decimal(38,0)) " +
            "* m1 * 1000000) div nk as bigint)"))
          .withColumn("v_micro", expr("cast((cast(n1 as decimal(38,0)) " +
            "* n0 * m1 * m0 * 1000000) div (cast(nk as decimal(38,0)) " +
            "* nk * (nk - 1)) as bigint)"))
        strata.agg(
            count(lit(1)).as("n_strata"),
            sum($"a").as("sum_a"),
            sum($"e_micro").as("e_micro_sum"),
            sum($"v_micro").as("v_micro_sum"),
            sum($"n1").as("n_a_total"), sum($"n0").as("n_b_total"),
            sum($"m1").as("conv_total"))
          .withColumn("conv_a", $"sum_a")
          .withColumn("d_micro", $"sum_a" * 1000000L - $"e_micro_sum")
          .withColumn("chi2_cmh_micro",
            expr("cast((cast(d_micro as decimal(38,0)) * d_micro) " +
              "div v_micro_sum as bigint)"))
          .withColumn("pooled_z2_micro", expr("cast(" +
            "((cast(n_a_total as decimal(38,0)) + n_b_total) " +
            "* (cast(conv_a as decimal(38,0)) * n_b_total " +
            "  - cast(conv_total - conv_a as decimal(38,0)) * n_a_total) " +
            "* (cast(conv_a as decimal(38,0)) * n_b_total " +
            "  - cast(conv_total - conv_a as decimal(38,0)) * n_a_total) " +
            "* 1000000) div (cast(n_a_total as decimal(38,0)) * n_b_total " +
            "* cast(conv_total as decimal(38,0)) " +
            "* (cast(n_a_total as decimal(38,0)) + n_b_total " +
            "   - conv_total)) as bigint)"))
          .select($"n_strata", $"sum_a", $"e_micro_sum", $"v_micro_sum",
            $"chi2_cmh_micro",
            ($"chi2_cmh_micro" >= 3841459L).as("significant_95"),
            $"pooled_z2_micro")
      },
      Some("""
        WITH u AS (
          SELECT user_id % 2 AS arm, user_id, date_trunc('day', ts) AS day,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM events GROUP BY 1, 2, 3),
        st AS (
          SELECT day,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                   AS a,
                 CAST(sum(conv) AS BIGINT) AS m1
          FROM u GROUP BY day),
        k AS (
          SELECT day, n1, n0, a, m1, n1 + n0 AS nk, n1 + n0 - m1 AS m0
          FROM st),
        m AS (
          SELECT day, a,
                 CAST((CAST(n1 AS HUGEINT) * m1 * 1000000) // nk AS BIGINT)
                   AS e_micro,
                 CAST((CAST(n1 AS HUGEINT) * n0 * m1 * m0 * 1000000)
                      // (CAST(nk AS HUGEINT) * nk * (nk - 1)) AS BIGINT)
                   AS v_micro,
                 n1, n0, m1
          FROM k),
        agg AS (
          SELECT count(*) AS n_strata,
                 CAST(sum(a) AS BIGINT) AS sum_a,
                 CAST(sum(e_micro) AS BIGINT) AS e_micro_sum,
                 CAST(sum(v_micro) AS BIGINT) AS v_micro_sum,
                 CAST(sum(n1) AS BIGINT) AS n_a_total,
                 CAST(sum(n0) AS BIGINT) AS n_b_total,
                 CAST(sum(m1) AS BIGINT) AS conv_total
          FROM m),
        f AS (
          SELECT *, sum_a * 1000000 - e_micro_sum AS d_micro,
                 conv_total - sum_a AS conv_b
          FROM agg)
        SELECT n_strata, sum_a, e_micro_sum, v_micro_sum,
               CAST((CAST(d_micro AS HUGEINT) * d_micro) // v_micro_sum
                 AS BIGINT) AS chi2_cmh_micro,
               CAST((CAST(d_micro AS HUGEINT) * d_micro) // v_micro_sum
                 AS BIGINT) >= 3841459 AS significant_95,
               CAST((CAST(n_a_total + n_b_total AS HUGEINT)
                     * (CAST(sum_a AS HUGEINT) * n_b_total
                        - CAST(conv_b AS HUGEINT) * n_a_total)
                     * (CAST(sum_a AS HUGEINT) * n_b_total
                        - CAST(conv_b AS HUGEINT) * n_a_total) * 1000000)
                    // (CAST(n_a_total AS HUGEINT) * n_b_total
                        * CAST(conv_total AS HUGEINT)
                        * (CAST(n_a_total + n_b_total AS HUGEINT)
                           - conv_total))
                 AS BIGINT) AS pooled_z2_micro
        FROM f"""))
  ,

    Q(
      "q314_chi2_independence",
      "CHI-SQUARE INDEPENDENCE TEST (lang x source contingency) — the " +
        "feature-selection / stratification-sanity primitive q298's " +
        "CMH presupposes: is document language independent of source? " +
        "The FULL 5x20 grid including structurally-zero cells (a " +
        "missing (lang, source) cell still contributes R*C/N expected " +
        "mass — dropping empty cells is the classic chi-square bug, " +
        "here made impossible by a distinct-langs x distinct-sources " +
        "cross join over bounded domains, left-joined to the observed " +
        "counts). Per-cell statistic cleared to integers: " +
        "(O*N - R*C)^2 * 1e6 div (N*R*C) micros, floor error <= 1 " +
        "micro per cell, order-independent because each cell floors " +
        "independently. The 95% critical value for the data-derived " +
        "df comes from the Wilson-Hilferty cube approximation — " +
        "df*(1 - 2/(9 df) + 1.645*sqrt(2/(9 df)))^3 — evaluated as " +
        "an explicit IEEE chain (division, correctly-rounded sqrt, " +
        "two multiplications; z_0.95 = 1.645 enters as a literal), " +
        "bit-identical on both engines, no chi-square table lookup " +
        "and no libm quantile. One row-scale aggregate; everything " +
        "after lives on the 100-cell grid. Fixtures assign sources " +
        "uniformly at random, so the expected verdict is the " +
        "negative control: fail to reject.",
      (s, dir) => {
        import s.implicits._
        val d = Tables.t(s, dir, "documents")
        // snap the <=100-row contingency cells: four consumers (row
        // totals, column totals, grand total, grid join) would otherwise
        // each re-run the document scan
        val cells = d.groupBy($"lang", $"source")
          .agg(count(lit(1)).as("o"))
          .localCheckpoint(true)
        val rows = cells.groupBy($"lang").agg(sum($"o").as("r"))
        val colsT = cells.groupBy($"source").agg(sum($"o").as("c"))
        val n = cells.agg(sum($"o").as("n"),
          countDistinct($"lang").as("nl"),
          countDistinct($"source").as("ns"))
        val grid = rows.crossJoin(colsT)
          .join(cells, Seq("lang", "source"), "left")
          .withColumn("o", coalesce($"o", lit(0L)))
          .crossJoin(broadcast(n))
        grid
          .withColumn("cell_micros",
            expr("((o * n - r * c) * (o * n - r * c) * 1000000) " +
              "DIV (n * r * c)"))
          .agg(
            first($"n").as("n_docs"),
            ((first($"nl") - 1) * (first($"ns") - 1)).as("df"),
            sum($"cell_micros").as("chi2_micros"))
          .withColumn("wh",
            lit(1.0) - lit(2.0) / (lit(9.0) * $"df".cast("double"))
              + lit(1.645) * sqrt(lit(2.0) / (lit(9.0) * $"df".cast("double"))))
          .withColumn("crit_micros",
            round($"df".cast("double") * $"wh" * $"wh" * $"wh" * 1e6)
              .cast("long"))
          .select($"n_docs", $"df".cast("long").as("df"),
            $"chi2_micros".cast("long").as("chi2_micros"),
            $"crit_micros",
            ($"chi2_micros" >= $"crit_micros").as("reject_independence"))
      },
      Some("""
        WITH cells AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS o
          FROM documents GROUP BY 1, 2),
        rows_t AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r
                   FROM cells GROUP BY lang),
        cols_t AS (SELECT source, CAST(sum(o) AS BIGINT) AS c
                   FROM cells GROUP BY source),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                       CAST(count(DISTINCT lang) AS BIGINT) AS nl,
                       CAST(count(DISTINCT source) AS BIGINT) AS ns
                FROM cells),
        grid AS (
          SELECT rt.lang, ct.source, rt.r, ct.c, coalesce(cl.o, 0) AS o
          FROM rows_t rt CROSS JOIN cols_t ct
          LEFT JOIN cells cl ON cl.lang = rt.lang AND cl.source = ct.source),
        st AS (
          SELECT CAST(min(t.n) AS BIGINT) AS n_docs,
                 CAST(min((t.nl - 1) * (t.ns - 1)) AS BIGINT) AS df,
                 CAST(sum(((o * t.n - r * c) * (o * t.n - r * c) * 1000000)
                   // (t.n * r * c)) AS BIGINT) AS chi2_micros
          FROM grid, tot t),
        wh AS (
          SELECT n_docs, df, chi2_micros,
                 1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))
                   + 1.645 * sqrt(2.0 / (9.0 * CAST(df AS DOUBLE))) AS w
          FROM st)
        SELECT n_docs, df, chi2_micros,
               CAST(round(CAST(df AS DOUBLE) * w * w * w * 1e6) AS BIGINT)
                 AS crit_micros,
               chi2_micros >= CAST(round(CAST(df AS DOUBLE) * w * w * w
                 * 1e6) AS BIGINT) AS reject_independence
        FROM wh""")),

    Q(
      "q315_spearman_rank_corr",
      "SPEARMAN RANK CORRELATION (monthly revenue vs monthly order " +
        "count) — the monotone-association companion to q198's " +
        "Pearson-OLS slope and q281's Theil-Sen: rank both series " +
        "and apply rho = 1 - 6*sum(d^2) / (n*(n^2-1)), EXACT in " +
        "integers because ranks are row_numbers with a deterministic " +
        "(value, month) tie-break — a full permutation on both " +
        "sides, no midrank floats — and the final ratio is one " +
        "sign-extracted cross-multiplied ppm div (Spark div " +
        "truncates toward zero, DuckDB // floors: they differ on " +
        "negatives, so the sign is pulled out first — the q208 " +
        "lesson). One row-scale aggregate to the ~80-month domain; " +
        "both ranking windows are bounded-domain ORDER BYs, never " +
        "row-scale sorts. Revenue and order count share an obvious " +
        "common cause (more orders, more revenue), so the expected " +
        "verdict is strong positive association — the positive " +
        "control beside q267/q314's negative ones.",
      (s, dir) => {
        import s.implicits._
        val m = Tables.t(s, dir, "orders")
          .groupBy(date_trunc("month", $"o_orderdate").as("mon"))
          .agg(sum(round($"o_totalprice" * 100).cast("long"))
            .as("rev_cents"),
            count(lit(1)).as("n_orders"))
        val ranked = m
          .withColumn("rr", row_number().over(
            Window.orderBy($"rev_cents", $"mon")))
          .withColumn("rn", row_number().over(
            Window.orderBy($"n_orders", $"mon")))
          .withColumn("d", ($"rr" - $"rn").cast("long"))
        ranked.agg(
            count(lit(1)).cast("long").as("n_months"),
            sum($"d" * $"d").as("sum_d2"))
          .withColumn("den",
            $"n_months" * ($"n_months" * $"n_months" - 1L))
          .withColumn("num", $"den" - lit(6L) * $"sum_d2")
          .select($"n_months", $"sum_d2",
            (when($"num" < 0, -1L).otherwise(1L) *
              expr("(abs(num) * 1000000) DIV den")).as("rho_ppm"))
      },
      Some("""
        WITH m AS (
          SELECT date_trunc('month', o_orderdate) AS mon,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS rev_cents,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT mon,
                 CAST(row_number() OVER (ORDER BY rev_cents, mon)
                   AS BIGINT) AS rr,
                 CAST(row_number() OVER (ORDER BY n_orders, mon)
                   AS BIGINT) AS rn
          FROM m),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_months,
                 CAST(sum((rr - rn) * (rr - rn)) AS BIGINT) AS sum_d2
          FROM ranked),
        f AS (
          SELECT n_months, sum_d2,
                 n_months * (n_months * n_months - 1) AS den,
                 n_months * (n_months * n_months - 1) - 6 * sum_d2 AS num
          FROM agg)
        SELECT n_months, sum_d2,
               (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * ((abs(num) * 1000000) // den) AS rho_ppm
        FROM f""")),

    Q(
      "q321_synthetic_control",
      "SYNTHETIC-CONTROL counterfactual for nation 0 — the causal " +
        "estimator for ONE treated unit where q259's diff-in-diff has " +
        "millions (Abadie's design, public-textbook): split order " +
        "months at the fixture midpoint ((min+max) div 2 over " +
        "year*12+month — q259's closed-form split on the month " +
        "domain), compute each nation's PRE and POST mean order value " +
        "in exact micro-cents (sum*1e6 div n, floors composed " +
        "deterministically — the q259 convention), weight every DONOR " +
        "nation by inverse pre-period distance to the treated nation " +
        "(w_d = 1e12 div (1e6 + |pre_d - pre_t|) — closer pre-trends " +
        "dominate the synthetic twin), and the counterfactual is the " +
        "weighted donor post mean Σ(w_d·post_d) div Σ(w_d) (the " +
        "product sum crosses int64, carried as DECIMAL(38) internally " +
        "and emitted BIGINT — bounded by the price scale, the q259 " +
        "rendering rule). effect = post_t − counterfactual. Plan: one " +
        "orders→customer equi-join (the only row-scale shuffle; " +
        "co-partitionable on custkey at 100 TB), one aggregate to the " +
        "50-cell (nation, period) domain with map-side partials, every " +
        "weight/counterfactual step on the 25-row nation domain with " +
        "broadcast treated scalars.",
      (s, dir) => {
        import s.implicits._
        val p = Tables.t(s, dir, "orders")
          .select($"o_custkey",
            (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"),
            expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
        val cust = Tables.t(s, dir, "customer")
          .select($"c_custkey", $"c_nationkey")
        val mid = broadcast(p.agg(expr("(min(m) + max(m)) div 2").as("mid")))
        val cells = p.join(cust, $"o_custkey" === $"c_custkey")
          .crossJoin(mid)
          .groupBy($"c_nationkey".as("nation"),
            ($"m" > $"mid").cast("int").as("post"))
          .agg(sum($"cents").as("s"), count(lit(1)).as("cnt"))
        val means = cells
          .groupBy($"nation")
          .agg(
            expr("cast(cast(sum(CASE WHEN post = 0 THEN s END) as " +
              "decimal(38,0)) * 1000000 div " +
              "sum(CASE WHEN post = 0 THEN cnt END) as bigint)")
              .as("pre_micros"),
            expr("cast(cast(sum(CASE WHEN post = 1 THEN s END) as " +
              "decimal(38,0)) * 1000000 div " +
              "sum(CASE WHEN post = 1 THEN cnt END) as bigint)")
              .as("post_micros"))
        val treated = broadcast(means.filter($"nation" === 0)
          .select($"pre_micros".as("t_pre"), $"post_micros".as("t_post")))
        means.filter($"nation" =!= 0).crossJoin(treated)
          .select($"nation", $"pre_micros", $"post_micros",
            $"t_pre", $"t_post",
            expr("1000000000000 div (1000000 + abs(pre_micros - t_pre))")
              .as("w"))
          .agg(
            count(lit(1)).as("n_donors"),
            first($"t_pre").as("t_pre_micros"),
            first($"t_post").as("t_post_micros"),
            expr("cast(sum(cast(w as decimal(38,0)) * post_micros) div " +
              "sum(cast(w as decimal(38,0))) as bigint)").as("cf_micros"))
          .select($"n_donors", $"t_pre_micros", $"t_post_micros",
            $"cf_micros",
            ($"t_post_micros" - $"cf_micros").as("effect_micros"))
      },
      Some("""
        WITH p AS (
          SELECT o_custkey,
                 year(o_orderdate) * 12 + month(o_orderdate) AS m,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
        mid AS (SELECT (min(m) + max(m)) // 2 AS mid FROM p),
        cells AS (
          SELECT c.c_nationkey AS nation,
                 CASE WHEN p.m > mid.mid THEN 1 ELSE 0 END AS post,
                 sum(p.cents) AS s, count(*) AS cnt
          FROM p JOIN customer c ON p.o_custkey = c.c_custkey
          CROSS JOIN mid
          GROUP BY 1, 2),
        means AS (
          SELECT nation,
                 CAST(sum(CASE WHEN post = 0 THEN s END) * 1000000 //
                   sum(CASE WHEN post = 0 THEN cnt END) AS BIGINT)
                   AS pre_micros,
                 CAST(sum(CASE WHEN post = 1 THEN s END) * 1000000 //
                   sum(CASE WHEN post = 1 THEN cnt END) AS BIGINT)
                   AS post_micros
          FROM cells GROUP BY nation),
        t AS (SELECT pre_micros AS t_pre, post_micros AS t_post
              FROM means WHERE nation = 0),
        d AS (
          SELECT m.nation, m.pre_micros, m.post_micros, t.t_pre, t.t_post,
                 1000000000000 // (1000000 + abs(m.pre_micros - t.t_pre))
                   AS w
          FROM means m CROSS JOIN t WHERE m.nation <> 0)
        SELECT CAST(count(*) AS BIGINT) AS n_donors,
               CAST(any_value(t_pre) AS BIGINT) AS t_pre_micros,
               CAST(any_value(t_post) AS BIGINT) AS t_post_micros,
               CAST(sum(w * post_micros) // sum(w) AS BIGINT) AS cf_micros,
               CAST(any_value(t_post) - sum(w * post_micros) // sum(w)
                 AS BIGINT) AS effect_micros
        FROM d""")),

    Q(
      "q351_shapley_attribution",
      "EXACT SHAPLEY-VALUE ATTRIBUTION over the 4-channel touch universe " +
        "(Shapley 1953 applied to marketing journeys, Zhao et al. 2018): " +
        "each purchase's credit is divided among the distinct channels it " +
        "touched by the full coalition sum phi_c = sum_{S not containing " +
        "c} |S|!(3-|S|)!/4! * [v(S+c) - v(S)], with the characteristic " +
        "function v(M) = cents of journeys whose touched-channel set is a " +
        "SUBSET of M. Everything is integer-exact: weights are scaled by " +
        "4! = 24 (w24 in {6,2,2,6} by |S|), popcounts are div/mod " +
        "arithmetic portable to both engines, and the unanimity-game " +
        "identity (v additive over exact-set masses => phi_c = " +
        "sum_{T contains c} m(T)/|T|, each 24/|T| an integer) is emitted " +
        "as a SECOND independently-computed column that must equal the " +
        "coalition sum — the query self-verifies the classic collapse of " +
        "set-based Shapley to equal-split-within-journey. Plan: the only " +
        "row-scale work is q210's shared touch universe aggregated to " +
        "per-journey channel bitmasks then to <=16 exact-set masses; the " +
        "entire Shapley algebra (v on 16 masks, 4x8 (c,S) pairs) lives " +
        "on broadcast literal domains. 100 TB: one shuffle to journeys, " +
        "one 16-row aggregate — the coalition machinery costs nothing " +
        "at any scale.",
      (s, dir) => {
        import s.implicits._
        val (_, j) = touchUniverse(s, dir)
        // per-journey touched-set bitmask + its (constant-per-pid) cents
        val m = j.groupBy($"pid")
          .agg(expr("bit_or(shiftleft(1, cast(ch as int)))").as("tmask"),
            max($"cents").as("cents"))
          .groupBy($"tmask")
          .agg(sum($"cents").as("set_cents"),
            count(lit(1)).as("n_journeys"))
        val masks = broadcast((0 until 16).toDF("vmask"))
        // v(M) = sum of exact-set masses m(T) with T subset of M
        val v = masks.join(m, expr("(tmask & vmask) = tmask"), "left")
          .groupBy($"vmask")
          .agg(coalesce(sum($"set_cents"), lit(0L)).as("v_cents"))
        val chans = broadcast((0 until 4).toDF("channel"))
        // (c, S) pairs with c not in S; w24 by |S| via div/mod popcount
        val pairs = chans.join(masks.withColumnRenamed("vmask", "smask"),
            expr("((smask div shiftleft(1, channel)) % 2) = 0"))
          .withColumn("pc", expr("(smask % 2) + ((smask div 2) % 2) + " +
            "((smask div 4) % 2) + ((smask div 8) % 2)"))
          .withColumn("w24", expr("CASE pc WHEN 0 THEN 6 WHEN 1 THEN 2 " +
            "WHEN 2 THEN 2 ELSE 6 END"))
          .withColumn("with_c", expr("smask + shiftleft(1, channel)"))
        val phi = pairs
          .join(v.select($"vmask".as("with_c"), $"v_cents".as("v_with")),
            Seq("with_c"))
          .join(v.select($"vmask".as("smask"), $"v_cents".as("v_without")),
            Seq("smask"))
          .groupBy($"channel")
          .agg(sum(expr("w24 * (v_with - v_without)"))
            .as("shapley_cents_x24"))
        // independent unanimity-identity column + touched totals
        val una = chans.join(m,
            expr("((tmask div shiftleft(1, channel)) % 2) = 1"), "left")
          .withColumn("tc", expr("(tmask % 2) + ((tmask div 2) % 2) + " +
            "((tmask div 4) % 2) + ((tmask div 8) % 2)"))
          .groupBy($"channel")
          .agg(coalesce(sum($"n_journeys"), lit(0L))
              .as("touched_journeys"),
            coalesce(sum($"set_cents"), lit(0L)).as("touched_cents"),
            coalesce(sum(expr("set_cents * (24 div tc)")), lit(0L))
              .as("unanimity_cents_x24"))
        val tot = broadcast(m.agg(
          (sum($"set_cents") * 24).as("total_x24")))
        phi.join(una, Seq("channel")).crossJoin(tot)
          .select($"channel".cast("long").as("channel"),
            $"touched_journeys", $"touched_cents",
            $"shapley_cents_x24", $"unanimity_cents_x24",
            expr("shapley_cents_x24 * 1000000 div total_x24")
              .as("share_ppm"))
          .orderBy($"channel")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) // 25
                   AS ch
          FROM events),
        p AS (SELECT user_id, event_id AS pid, us AS pus, cents
              FROM ev WHERE event_type = 'purchase'),
        c AS (SELECT user_id, event_id AS cid, us AS cus, ch
              FROM ev WHERE event_type = 'click'),
        tu AS (
          SELECT p.pid, p.cents, c.ch
          FROM p JOIN c ON p.user_id = c.user_id
          WHERE (c.cus < p.pus OR (c.cus = p.pus AND c.cid < p.pid))
            AND p.pus - c.cus <= 86400000000),
        jm AS (
          SELECT pid, bit_or(CAST(1 << ch AS BIGINT)) AS tmask,
                 max(cents) AS cents
          FROM tu GROUP BY pid),
        m AS (
          SELECT tmask, sum(cents) AS set_cents,
                 CAST(count(*) AS BIGINT) AS n_journeys
          FROM jm GROUP BY tmask),
        masks AS (SELECT range AS vmask FROM range(16)),
        v AS (
          SELECT vmask,
                 coalesce(sum(m.set_cents), 0) AS v_cents
          FROM masks LEFT JOIN m ON (m.tmask & masks.vmask) = m.tmask
          GROUP BY vmask),
        chans AS (SELECT range AS channel FROM range(4)),
        pairs AS (
          SELECT channel, vmask AS smask,
                 (vmask % 2) + ((vmask // 2) % 2) + ((vmask // 4) % 2)
                   + ((vmask // 8) % 2) AS pc,
                 vmask + (1 << channel) AS with_c
          FROM chans JOIN masks
            ON ((vmask // (1 << channel)) % 2) = 0),
        phi AS (
          SELECT channel,
                 sum((CASE pc WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
                      ELSE 6 END) * (vw.v_cents - vo.v_cents))
                   AS shapley_cents_x24
          FROM pairs
          JOIN v vw ON vw.vmask = pairs.with_c
          JOIN v vo ON vo.vmask = pairs.smask
          GROUP BY channel),
        una AS (
          SELECT channel,
                 coalesce(sum(m.n_journeys), 0) AS touched_journeys,
                 coalesce(sum(m.set_cents), 0) AS touched_cents,
                 coalesce(sum(m.set_cents * (24 // ((m.tmask % 2)
                   + ((m.tmask // 2) % 2) + ((m.tmask // 4) % 2)
                   + ((m.tmask // 8) % 2)))), 0) AS unanimity_cents_x24
          FROM chans LEFT JOIN m
            ON ((m.tmask // (1 << channel)) % 2) = 1
          GROUP BY channel),
        tot AS (SELECT sum(set_cents) * 24 AS total_x24 FROM m)
        SELECT CAST(phi.channel AS BIGINT) AS channel,
               CAST(touched_journeys AS BIGINT) AS touched_journeys,
               CAST(touched_cents AS BIGINT) AS touched_cents,
               CAST(shapley_cents_x24 AS BIGINT) AS shapley_cents_x24,
               CAST(unanimity_cents_x24 AS BIGINT) AS unanimity_cents_x24,
               CAST(shapley_cents_x24 * 1000000 // total_x24 AS BIGINT)
                 AS share_ppm
        FROM phi JOIN una ON phi.channel = una.channel
        CROSS JOIN tot
        ORDER BY channel""")),

    Q(
      "q352_regression_discontinuity",
      "SHARP REGRESSION-DISCONTINUITY estimate at a $250k order-total " +
        "cutoff (Thistlethwaite-Campbell 1960; the standard local-linear " +
        "RD of Imbens-Lemieux 2008): outcome = lineitems per order, " +
        "running variable x = cents - 25_000_000, bandwidth $50k each " +
        "side, SEPARATE exact OLS fits left and right, effect = " +
        "right-intercept minus left-intercept at the cutoff. All five " +
        "OLS sufficient statistics (n, Sx, Sy, Sxy, Sxx) are exact " +
        "BIGINTs from ONE conditional aggregate; the closed-form " +
        "intercept (SxxSy - SxSxy)/(nSxx - SxSx) and slope " +
        "(nSxy - SxSy)/(nSxx - SxSx) are cleared in DECIMAL(38,0) and " +
        "emitted as micro-lineitems / pico-lineitems-per-cent BIGINTs. " +
        "The synthetic fixture has no true discontinuity — the query is " +
        "its own negative control (q293's A/A discipline; the near-zero " +
        "effect IS the finding). Plan: orders->lineitem-count is one " +
        "orderkey aggregate + broadcast-joinable band filter; the OLS " +
        "algebra is a 1-row reduce. 100 TB: the band filter pushes to " +
        "the scan, everything else is map-side-combined sums.",
      (s, dir) => {
        import s.implicits._
        val cut = 25000000L; val h = 5000000L
        val cnt = Tables.t(s, dir, "lineitem")
          .groupBy($"l_orderkey".as("okey"))
          .agg(count(lit(1)).as("y"))
        Tables.t(s, dir, "orders")
          .select($"o_orderkey",
            (expr("cast(round(o_totalprice * 100) as bigint)") - cut)
              .as("x"))
          .filter($"x" >= -h && $"x" < h)
          .join(cnt, $"o_orderkey" === $"okey", "left")
          .select($"x", coalesce($"y", lit(0L)).as("y"),
            ($"x" >= 0).cast("int").as("side"))
          .groupBy($"side")
          .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
            sum($"y").as("sy"),
            // second moments accumulate in DECIMAL(38,0): per-row x*y /
            // x*x peak ~2.5e13, so a plain LONG sum wraps silently past
            // ~3.7e5 band rows while DuckDB's sum(BIGINT) promotes to
            // HUGEINT — the q380/q381 convention keeps both engines exact
            sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
            sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"))
          .withColumn("den", expr(
            "cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"))
          .select($"side".cast("long").as("side"), $"n",
            expr("cast((sxx * sy - " +
              "cast(sx as decimal(38,0)) * sxy) * 1000000 div den " +
              "as bigint)").as("intercept_micro"),
            expr("cast((cast(n as decimal(38,0)) * sxy - " +
              "cast(sx as decimal(38,0)) * sy) * 1000000000000 div den " +
              "as bigint)").as("slope_pico"))
          .withColumn("rd_effect_micro",
            expr("max(CASE WHEN side = 1 THEN intercept_micro END) " +
              "over () - max(CASE WHEN side = 0 THEN intercept_micro " +
              "END) over ()"))
          .orderBy($"side")
      },
      Some("""
        WITH cnt AS (
          SELECT l_orderkey AS okey, CAST(count(*) AS BIGINT) AS y
          FROM lineitem GROUP BY 1),
        band AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) - 25000000
                   AS x,
                 coalesce(cnt.y, 0) AS y
          FROM orders LEFT JOIN cnt ON orders.o_orderkey = cnt.okey
          WHERE CAST(round(o_totalprice * 100) AS BIGINT) - 25000000
                  >= -5000000
            AND CAST(round(o_totalprice * 100) AS BIGINT) - 25000000
                  < 5000000),
        st AS (
          SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS side,
                 CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                 sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
          FROM band GROUP BY 1),
        fit AS (
          SELECT side, n,
                 CAST((CAST(sxx AS HUGEINT) * sy
                     - CAST(sx AS HUGEINT) * sxy) * 1000000
                   // (CAST(n AS HUGEINT) * sxx
                     - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                   AS intercept_micro,
                 CAST((CAST(n AS HUGEINT) * sxy
                     - CAST(sx AS HUGEINT) * sy) * 1000000000000
                   // (CAST(n AS HUGEINT) * sxx
                     - CAST(sx AS HUGEINT) * sx) AS BIGINT)
                   AS slope_pico
          FROM st)
        SELECT CAST(side AS BIGINT) AS side, n, intercept_micro,
               slope_pico,
               max(CASE WHEN side = 1 THEN intercept_micro END) OVER ()
                 - max(CASE WHEN side = 0 THEN intercept_micro END)
                   OVER () AS rd_effect_micro
        FROM fit ORDER BY side""")),

    Q(
      "q353_wald_iv_estimator",
      "INSTRUMENTAL-VARIABLE WALD ESTIMATOR (Wald 1940; the " +
        "encouragement-design LATE of Angrist-Imbens-Rubin 1996): " +
        "instrument Z = user_id parity (as-good-as-random), treatment " +
        "uptake T = user clicked >= 13 times (13 = the fixture's median " +
        "click count, picked so the first stage is non-degenerate at " +
        "every sf), outcome Y = user purchase " +
        "cents. Wald = ITT(Y)/ITT(T); cross-multiplying both intent-to-" +
        "treat differences by n1*n0 makes the n1*n0 factors CANCEL " +
        "exactly, so the estimator is the pure integer rational " +
        "(Sy1*n0 - Sy0*n1)/(St1*n0 - St0*n1) — cleared in " +
        "DECIMAL(38,0), micro-scaled, NULLIF-guarded against a zero " +
        "first stage (a weak-instrument fixture must yield NULL, not a " +
        "crash). First-stage uptake ppm per arm is emitted beside it — " +
        "the weak-instrument diagnostic every IV report needs. Plan: " +
        "ONE events scan to per-user (clicks, cents), one 2-row " +
        "conditional aggregate; 100 TB is one user-keyed shuffle.",
      (s, dir) => {
        import s.implicits._
        val u = Tables.t(s, dir, "events")
          .groupBy($"user_id")
          .agg(
            sum(($"event_type" === "click").cast("long")).as("clicks"),
            sum(when($"event_type" === "purchase",
              expr("cast(round(value * 100) as bigint)"))
              .otherwise(0L)).as("cents"))
          .select(($"user_id" % 2).as("z"),
            ($"clicks" >= 13).cast("long").as("t"), $"cents")
        u.agg(
            sum(when($"z" === 0, 1L).otherwise(0L)).as("n0"),
            sum(when($"z" === 1, 1L).otherwise(0L)).as("n1"),
            sum(when($"z" === 0, $"t").otherwise(0L)).as("st0"),
            sum(when($"z" === 1, $"t").otherwise(0L)).as("st1"),
            sum(when($"z" === 0, $"cents").otherwise(0L)).as("sy0"),
            sum(when($"z" === 1, $"cents").otherwise(0L)).as("sy1"))
          .select($"n0", $"n1",
            expr("st0 * 1000000 div n0").as("uptake0_ppm"),
            expr("st1 * 1000000 div n1").as("uptake1_ppm"),
            expr("cast(cast(sy1 as decimal(38,0)) * n0 - " +
              "cast(sy0 as decimal(38,0)) * n1 as decimal(38,0))")
              .as("itt_y_num"),
            expr("cast(st1 as decimal(38,0)) * n0 - " +
              "cast(st0 as decimal(38,0)) * n1").as("itt_t_num"))
          .select($"n0", $"n1", $"uptake0_ppm", $"uptake1_ppm",
            expr("cast(itt_y_num as bigint)").as("itt_y_num"),
            expr("cast(itt_t_num as bigint)").as("itt_t_num"),
            expr("cast(itt_y_num * 1000000 div nullif(itt_t_num, 0) " +
              "as bigint)").as("wald_cents_micro"))
      },
      Some("""
        WITH u AS (
          SELECT user_id % 2 AS z,
                 CASE WHEN sum(CASE WHEN event_type = 'click' THEN 1
                   ELSE 0 END) >= 13 THEN 1 ELSE 0 END AS t,
                 sum(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT)
                   ELSE 0 END) AS cents
          FROM events GROUP BY user_id),
        st AS (
          SELECT CAST(sum(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(sum(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 sum(CASE WHEN z = 0 THEN t ELSE 0 END) AS st0,
                 sum(CASE WHEN z = 1 THEN t ELSE 0 END) AS st1,
                 sum(CASE WHEN z = 0 THEN cents ELSE 0 END) AS sy0,
                 sum(CASE WHEN z = 1 THEN cents ELSE 0 END) AS sy1
          FROM u)
        SELECT n0, n1,
               CAST(st0 * 1000000 // n0 AS BIGINT) AS uptake0_ppm,
               CAST(st1 * 1000000 // n1 AS BIGINT) AS uptake1_ppm,
               CAST(CAST(sy1 AS HUGEINT) * n0
                 - CAST(sy0 AS HUGEINT) * n1 AS BIGINT) AS itt_y_num,
               CAST(st1 * n0 - st0 * n1 AS BIGINT) AS itt_t_num,
               CAST((CAST(sy1 AS HUGEINT) * n0
                   - CAST(sy0 AS HUGEINT) * n1) * 1000000
                 // nullif(st1 * n0 - st0 * n1, 0) AS BIGINT)
                 AS wald_cents_micro
        FROM st""")),

    Q(
      "q358_kruskal_wallis",
      "KRUSKAL-WALLIS RANK TEST across the 5 regions on order totals " +
        "(Kruskal-Wallis 1952 — the nonparametric ANOVA; q267's " +
        "Mann-Whitney generalized to k groups): H = 12/(N(N+1)) * " +
        "sum_g R_g^2/n_g - 3(N+1) with tie correction 1 - sum(t^3-t)/" +
        "(N^3-N). Ranks are exact DOUBLED MIDRANKS from the counting-" +
        "CDF on the distinct cents domain (2*(#below) + cnt + 1 — " +
        "q267's integer-exact trick, never a row sort), group rank " +
        "sums divide by 4 implicitly via R2^2/(4n). Division floors " +
        "are DECIMAL(38,0)-internal and part of the spec'd arithmetic " +
        "— both engines floor identically, so the statistic is " +
        "bit-exact. The chi-square df=4 95% critical enters as the " +
        "micro literal 9487729 (q238/q289's no-libm constant rule). " +
        "The fixture's uniform prices are region-independent — " +
        "accept IS the expected verdict (q293's negative-control " +
        "discipline). Plan: one orders scan joined to two broadcast " +
        "dims, one cents-domain count frame; every window runs on " +
        "the value DOMAIN. 100 TB: one shuffle to the cents domain.",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
          .join(broadcast(Tables.t(s, dir, "customer")),
            $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .select($"n_regionkey".as("g"),
            expr("cast(round(o_totalprice * 100) as bigint)")
              .as("cents"))
        val dom = o.groupBy($"cents")
          .agg(count(lit(1)).as("cnt"))
        val wBelow = Window.orderBy($"cents")
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = dom.withColumn("below",
            coalesce(sum($"cnt").over(wBelow), lit(0L)))
          // doubled midrank shared by every row of this cents value
          .withColumn("r2", $"below" * 2 + $"cnt" + 1)
        val gsum = o.join(ranked, Seq("cents"))
          .groupBy($"g")
          .agg(count(lit(1)).as("n_g"), sum($"r2").as("r2_g"))
        val ties = dom.agg(
          sum($"cnt" * $"cnt" * $"cnt" - $"cnt").as("t_sum"),
          sum($"cnt").as("n_total"))
        gsum.agg(
            // floor the per-group R2^2/n FIRST (fits a long), scale
            // after — the floor placement is part of the spec'd
            // arithmetic and identical on both engines
            sum(expr("cast(r2_g as decimal(38,0)) * r2_g div n_g"))
              .as("s_quarter"),
            count(lit(1)).as("k_groups"))
          .crossJoin(broadcast(ties))
          .select($"k_groups", $"n_total",
            expr("cast(cast(s_quarter as decimal(38,0)) * 3000000 div " +
              "(cast(n_total as decimal(38,0)) * (n_total + 1)) " +
              "- 3 * (n_total + 1) * 1000000 as bigint)")
              .as("h_micro"),
            expr("cast(1000000 - cast(t_sum as decimal(38,0)) * " +
              "1000000 div (cast(n_total as decimal(38,0)) * n_total " +
              "* n_total - n_total) as bigint)").as("tie_corr_ppm"))
          .select($"k_groups", $"n_total", $"h_micro", $"tie_corr_ppm",
            expr("cast(cast(h_micro as decimal(38,0)) * 1000000 div " +
              "tie_corr_ppm as bigint)").as("h_corrected_micro"),
            expr("cast(cast(h_micro as decimal(38,0)) * 1000000 div " +
              "tie_corr_ppm >= 9487729 as boolean)").as("reject_95"))
      },
      Some("""
        WITH o AS (
          SELECT n.n_regionkey AS g,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
          JOIN customer c ON o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
        dom AS (
          SELECT cents, CAST(count(*) AS BIGINT) AS cnt
          FROM o GROUP BY 1),
        ranked AS (
          SELECT cents,
                 coalesce(sum(cnt) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) * 2 + cnt + 1 AS r2
          FROM dom),
        gsum AS (
          SELECT g, CAST(count(*) AS BIGINT) AS n_g,
                 CAST(sum(r2) AS BIGINT) AS r2_g
          FROM o JOIN ranked USING (cents) GROUP BY g),
        ties AS (
          SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS t_sum,
                 CAST(sum(cnt) AS BIGINT) AS n_total
          FROM dom),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS k_groups,
                 sum(CAST(r2_g AS HUGEINT) * r2_g // n_g) AS s_quarter
          FROM gsum),
        h AS (
          SELECT k_groups, n_total,
                 CAST(CAST(s_quarter AS HUGEINT) * 3000000
                     // (CAST(n_total AS HUGEINT) * (n_total + 1))
                   - 3 * (n_total + 1) * 1000000 AS BIGINT) AS h_micro,
                 CAST(1000000 - CAST(t_sum AS HUGEINT) * 1000000
                   // (CAST(n_total AS HUGEINT) * n_total * n_total
                     - n_total) AS BIGINT) AS tie_corr_ppm
          FROM agg CROSS JOIN ties)
        SELECT k_groups, n_total, h_micro, tie_corr_ppm,
               CAST(CAST(h_micro AS HUGEINT) * 1000000 // tie_corr_ppm
                 AS BIGINT) AS h_corrected_micro,
               CAST(h_micro AS HUGEINT) * 1000000 // tie_corr_ppm
                 >= 9487729 AS reject_95
        FROM h""")),

    Q(
      "q363_markov_attribution",
      "FIRST-ORDER MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. " +
        "2016 — the data-driven attribution model beside the Shapley " +
        "family, completing q210/q213/q251/q284/q351): journeys are " +
        "states S -> channel* -> {C, N} — converting paths from the " +
        "q351 touch universe (per-purchase touches in time order), " +
        "null paths from UNATTACHED clicks grouped per (user, day). " +
        "Transition probabilities are integer ppm floors; conversion " +
        "probability from S is a 30-step fixed-point iteration a'(f) " +
        "= p(f,C) + floor(sum_t p(f,t)*a(t) / 1e6) — monotone " +
        "nondecreasing from 0 and integer-valued, so 30 steps reach " +
        "the exact fixed point at fixture path lengths; the floors " +
        "are part of the spec'd arithmetic, replayed IDENTICALLY by " +
        "the oracle's 30 chained CTEs (generated, not hand-unrolled). " +
        "Channel x's removal effect drops every edge INTO x (paths " +
        "through x die, the standard removal semantics) and re-runs " +
        "the same iteration; shares normalize the four deltas. The " +
        "row-scale work is TWO window passes (per-pid, per-user-day) " +
        "to transition pairs and one <=30-row count aggregate; the " +
        "Markov algebra runs on the collected <=30-row count table " +
        "on the driver (a bounded artifact, q126's codebook " +
        "discipline) in exact Long arithmetic. 100 TB: one shuffle " +
        "to journeys; the chain solve costs microseconds at any " +
        "corpus size.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .withColumn("us", unix_micros($"ts".cast("timestamp")))
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"event_id".as("cid"), $"us".as("cus"),
            expr("cast(get_json_object(props, '$.k') as bigint) div 25")
              .cast("string").as("st"))
        val purch = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id".as("pid"), $"us".as("pus"))
        val touches = clicks.join(purch, Seq("user_id"))
          .filter(($"cus" < $"pus" ||
            ($"cus" === $"pus" && $"cid" < $"pid")) &&
            $"pus" - $"cus" <= 86400000000L)
          .select($"pid", $"cid", $"cus", $"st")
        val wConv = Window.partitionBy($"pid").orderBy($"cus", $"cid")
        val conv = touches
          .withColumn("rn", row_number().over(wConv))
          .withColumn("nxt", lead($"st", 1).over(wConv))
        val unattached = clicks.join(
          touches.select($"cid").distinct(), Seq("cid"), "left_anti")
        val wNull = Window
          .partitionBy($"user_id", expr("cus div 86400000000"))
          .orderBy($"cus", $"cid")
        val nul = unattached
          .withColumn("rn", row_number().over(wNull))
          .withColumn("nxt", lead($"st", 1).over(wNull))
        val trans = conv.filter($"rn" === 1)
          .select(lit("S").as("f"), $"st".as("t"))
          .unionAll(conv.select($"st".as("f"),
            coalesce($"nxt", lit("C")).as("t")))
          .unionAll(nul.filter($"rn" === 1)
            .select(lit("S").as("f"), $"st".as("t")))
          .unionAll(nul.select($"st".as("f"),
            coalesce($"nxt", lit("N")).as("t")))
        val cnt = trans.groupBy($"f", $"t").count()
          .collect().map(r =>
            (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val fromTot = cnt.groupBy(_._1._1)
          .map { case (f, m) => f -> m.values.sum }
        def p(f: String, t: String): Long = {
          val c = cnt.getOrElse((f, t), 0L)
          if (c == 0L) 0L else c * 1000000L / fromTot(f)
        }
        val states = "S" +: Seq("0", "1", "2", "3")
          .filter(fromTot.contains)
        val chans = states.tail
        def absorb(removed: Option[String]): Long = {
          var a = states.map(_ -> 0L).toMap
          for (_ <- 1 to 30) {
            val prev = a
            a = states.map { f =>
              val flow = chans.filter(t => !removed.contains(t))
                .map(t => p(f, t) * prev(t)).sum / 1000000L
              f -> (p(f, "C") + flow)
            }.toMap
          }
          a("S")
        }
        val base = absorb(None)
        val rows = (0 to 3).map { x =>
          val rem = absorb(Some(x.toString))
          (x.toLong, base, rem, base - rem)
        }
        val sumDelta = rows.map(_._4).sum
        val out = rows.map { case (x, b, r, d) =>
          (x, b, r,
            if (b == 0) None else Some(d * 1000000L / b),
            if (sumDelta == 0) None else Some(d * 1000000L / sumDelta))
        }
        out.toDF("channel", "conv_base_ppm", "conv_removed_ppm",
          "removal_effect_ppm", "share_ppm")
          .orderBy($"channel")
      },
      Some(markovOracleSql)),

    Q(
      "q400_did_permutation_test",
      "PERMUTATION PLACEBO TEST FOR THE DiD ESTIMATE (Fisher 1935 " +
        "randomization inference, the placebo discipline " +
        "Bertrand-Duflo-Mullainathan 2004 demands of any DiD: " +
        "re-estimate q259's effect under 99 FAKE treatment " +
        "assignments; if the real |effect| is unremarkable among " +
        "placebos, the 'effect' is noise): placebo arm p = the " +
        "engine-portable Knuth mix of (user, p) — deterministic, so " +
        "the permutation schedule itself is part of the oracle (the " +
        "q244 bootstrap discipline) — and perm 0 is the REAL parity " +
        "assignment. All 100 DiD estimates come from ONE pass: " +
        "explode each purchase across the bounded perm domain, one " +
        "(perm, arm, period) aggregate (400 cells), per-perm effect " +
        "via q259's exact 4-floor algebra, then the rank statistic " +
        "p = #(|placebo| >= |real|)/100 — including the real one, " +
        "Fisher's convention, so p >= 1/100 by construction. 100 TB: " +
        "the explode multiplies rows by a CONSTANT 100 into a " +
        "map-side-combined 400-cell aggregate — no extra shuffle " +
        "grain, no resampling of raw data.",
      (s, dir) => {
        import s.implicits._
        val p = Tables.t(s, dir, "events")
          .filter($"event_type" === "purchase")
          .select($"user_id",
            expr("datediff(cast(ts as date), date '1970-01-01')")
              .as("d"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
        val mid = broadcast(
          p.agg(expr("(min(d) + max(d)) div 2").as("mid")))
        val cells = p.crossJoin(mid)
          .select($"user_id", ($"d" > $"mid").cast("int").as("post"),
            $"cents",
            explode(expr("sequence(0, 99)")).as("perm"))
          .select($"perm", $"post", $"cents",
            when($"perm" === 0, $"user_id" % 2)
              .otherwise(($"user_id" * 2654435761L +
                $"perm" * 40503L + 11L) % 4093L % 2L)
              .cast("int").as("treat"))
          .groupBy($"perm")
          .agg(
            sum(when($"treat" === 1 && $"post" === 1, $"cents"))
              .as("s11"),
            count(when($"treat" === 1 && $"post" === 1, 1)).as("n11"),
            sum(when($"treat" === 1 && $"post" === 0, $"cents"))
              .as("s10"),
            count(when($"treat" === 1 && $"post" === 0, 1)).as("n10"),
            sum(when($"treat" === 0 && $"post" === 1, $"cents"))
              .as("s01"),
            count(when($"treat" === 0 && $"post" === 1, 1)).as("n01"),
            sum(when($"treat" === 0 && $"post" === 0, $"cents"))
              .as("s00"),
            count(when($"treat" === 0 && $"post" === 0, 1)).as("n00"))
          .select($"perm",
            (expr("cast(cast(s11 as decimal(38,0)) * 1000000 div " +
              "nullif(n11, 0) as bigint)") -
              expr("cast(cast(s10 as decimal(38,0)) * 1000000 div " +
                "nullif(n10, 0) as bigint)") -
              (expr("cast(cast(s01 as decimal(38,0)) * 1000000 div " +
                "nullif(n01, 0) as bigint)") -
                expr("cast(cast(s00 as decimal(38,0)) * 1000000 div " +
                  "nullif(n00, 0) as bigint)"))).as("did_micros"))
        val real = broadcast(cells.filter($"perm" === 0)
          .select($"did_micros".as("real_micros")))
        cells.crossJoin(real)
          .agg(count(lit(1)).as("n_perms"),
            max($"real_micros").as("did_real_micros"),
            sum((abs($"did_micros") >= abs($"real_micros"))
              .cast("long")).as("n_as_extreme"),
            max(abs($"did_micros")).as("max_abs_placebo_micros"))
          .withColumn("p_milli",
            expr("n_as_extreme * 1000 div n_perms"))
      },
      Some("""
        WITH p AS (
          SELECT user_id,
                 datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS d,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        m AS (SELECT (min(d) + max(d)) // 2 AS mid FROM p),
        x AS (
          SELECT perm,
                 CASE WHEN d > mid THEN 1 ELSE 0 END AS post, cents,
                 CASE WHEN perm = 0 THEN user_id % 2
                      ELSE (user_id * 2654435761 + perm * 40503 + 11)
                        % 4093 % 2 END AS treat
          FROM p CROSS JOIN m
          CROSS JOIN (SELECT unnest(generate_series(0, 99)) AS perm)),
        cells AS (
          SELECT perm,
                 sum(CASE WHEN treat = 1 AND post = 1 THEN cents END)
                   AS s11,
                 count(CASE WHEN treat = 1 AND post = 1 THEN 1 END)
                   AS n11,
                 sum(CASE WHEN treat = 1 AND post = 0 THEN cents END)
                   AS s10,
                 count(CASE WHEN treat = 1 AND post = 0 THEN 1 END)
                   AS n10,
                 sum(CASE WHEN treat = 0 AND post = 1 THEN cents END)
                   AS s01,
                 count(CASE WHEN treat = 0 AND post = 1 THEN 1 END)
                   AS n01,
                 sum(CASE WHEN treat = 0 AND post = 0 THEN cents END)
                   AS s00,
                 count(CASE WHEN treat = 0 AND post = 0 THEN 1 END)
                   AS n00
          FROM x GROUP BY perm),
        dids AS (
          SELECT perm,
                 CAST(CAST(s11 AS HUGEINT) * 1000000
                     // nullif(n11, 0) AS BIGINT)
                 - CAST(CAST(s10 AS HUGEINT) * 1000000
                     // nullif(n10, 0) AS BIGINT)
                 - (CAST(CAST(s01 AS HUGEINT) * 1000000
                     // nullif(n01, 0) AS BIGINT)
                   - CAST(CAST(s00 AS HUGEINT) * 1000000
                     // nullif(n00, 0) AS BIGINT)) AS did_micros
          FROM cells),
        r AS (SELECT did_micros AS real_micros FROM dids
              WHERE perm = 0)
        SELECT CAST(count(*) AS BIGINT) AS n_perms,
               CAST(max(real_micros) AS BIGINT) AS did_real_micros,
               CAST(sum(CASE WHEN abs(did_micros) >= abs(real_micros)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_as_extreme,
               CAST(max(abs(did_micros)) AS BIGINT)
                 AS max_abs_placebo_micros,
               CAST(sum(CASE WHEN abs(did_micros) >= abs(real_micros)
                 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
                 AS p_milli
        FROM dids CROSS JOIN r"""))
  )

  /** q363's oracle: the SAME 30-step integer-ppm fixed point, the
    * iteration unrolled as generated chained CTEs (a0..a30). */
  private def markovOracleSql: String = {
    val steps = (1 to 30).map { k =>
      s"""a$k AS MATERIALIZED (
        SELECT fs.x, fs.f AS state, fs.pc + coalesce(y.s2, 0) AS a
        FROM fs LEFT JOIN (
          SELECT prev.x, ch.f,
                 CAST(sum(ch.p * prev.a) // 1000000 AS BIGINT) AS s2
          FROM ch JOIN a${k - 1} prev
            ON prev.state = ch.t AND ch.t <> CAST(prev.x AS VARCHAR)
          GROUP BY 1, 2) y ON y.x = fs.x AND y.f = fs.f)"""
    }.mkString(",\n")
    s"""
      WITH ev AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CAST(CAST(json_extract_string(props, '$$.k') AS BIGINT)
                 // 25 AS VARCHAR) AS st
        FROM events),
      c AS (SELECT user_id, event_id AS cid, us AS cus, st
            FROM ev WHERE event_type = 'click'),
      p AS (SELECT user_id, event_id AS pid, us AS pus
            FROM ev WHERE event_type = 'purchase'),
      tch AS (
        SELECT p.pid, c.cid, c.cus, c.st
        FROM c JOIN p ON c.user_id = p.user_id
        WHERE (c.cus < p.pus OR (c.cus = p.pus AND c.cid < p.pid))
          AND p.pus - c.cus <= 86400000000),
      conv AS (
        SELECT pid, st, cus, cid,
               row_number() OVER (PARTITION BY pid
                 ORDER BY cus, cid) AS rn,
               lead(st) OVER (PARTITION BY pid
                 ORDER BY cus, cid) AS nxt
        FROM tch),
      un AS (
        SELECT c.user_id, c.cid, c.cus, c.st FROM c
        WHERE c.cid NOT IN (SELECT DISTINCT cid FROM tch)),
      nl AS (
        SELECT st, cus, cid,
               row_number() OVER (PARTITION BY user_id,
                 cus // 86400000000 ORDER BY cus, cid) AS rn,
               lead(st) OVER (PARTITION BY user_id,
                 cus // 86400000000 ORDER BY cus, cid) AS nxt
        FROM un),
      tr AS (
        SELECT 'S' AS f, st AS t FROM conv WHERE rn = 1
        UNION ALL SELECT st, coalesce(nxt, 'C') FROM conv
        UNION ALL SELECT 'S', st FROM nl WHERE rn = 1
        UNION ALL SELECT st, coalesce(nxt, 'N') FROM nl),
      cnt AS (SELECT f, t, CAST(count(*) AS BIGINT) AS c
              FROM tr GROUP BY 1, 2),
      tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS tc
              FROM cnt GROUP BY 1),
      pr AS (SELECT cnt.f, cnt.t,
                    CAST(cnt.c * 1000000 // tot.tc AS BIGINT) AS p
             FROM cnt JOIN tot ON cnt.f = tot.f),
      pct AS (SELECT f,
                     coalesce(sum(CASE WHEN t = 'C' THEN p END), 0)
                       AS pc
              FROM pr GROUP BY f),
      ch AS MATERIALIZED (SELECT f, t, p FROM pr
             WHERE t IN ('0', '1', '2', '3')),
      scen AS (SELECT * FROM (VALUES (-1), (0), (1), (2), (3))
               AS s(x)),
      fs AS MATERIALIZED (
        SELECT scen.x, pct.f, pct.pc FROM scen CROSS JOIN pct),
      a0 AS (SELECT x, f AS state, CAST(0 AS BIGINT) AS a FROM fs),
      $steps,
      base AS (SELECT a AS cb FROM a30 WHERE x = -1 AND state = 'S'),
      rem AS (SELECT x AS channel, a AS cr FROM a30
              WHERE x >= 0 AND state = 'S'),
      eff AS (SELECT channel, cb, cr, cb - cr AS delta
              FROM rem CROSS JOIN base),
      t2 AS (SELECT CAST(sum(delta) AS BIGINT) AS sd FROM eff)
      SELECT CAST(channel AS BIGINT) AS channel,
             CAST(cb AS BIGINT) AS conv_base_ppm,
             CAST(cr AS BIGINT) AS conv_removed_ppm,
             CAST(delta * 1000000 // nullif(cb, 0) AS BIGINT)
               AS removal_effect_ppm,
             CAST(delta * 1000000 // nullif(sd, 0) AS BIGINT)
               AS share_ppm
      FROM eff CROSS JOIN t2 ORDER BY channel"""
  }
}

