package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function capability surface (SURVEY.md §2B "Window functions"):
  * ranking, analytic (lag/lead/first/last), aggregates over ROWS and RANGE
  * frames, per-group top-k, and pivot.
  *
  * Scale notes (100 TB): every window below is keyed by a high-cardinality
  * partition column (user_id, c_nationkey, brand) so state per partition is
  * bounded; a single exchange on the partition key feeds all window
  * functions sharing that key (Catalyst collapses them into one Window
  * operator). Window ORDER BY includes a unique id so ranking is
  * deterministic. Oracle casts row_number/ntile (DuckDB BIGINT) to INTEGER
  * to match Spark's IntegerType.
  */
object WindowOps extends QueryModule {

  override def queries: Seq[Q] = Seq(
    Q(
      "q20_window_ranking",
      "row_number / rank / dense_rank / ntile per nation by acctbal.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
        Tables.t(s, dir, "customer")
          .select(
            $"c_nationkey", $"c_custkey", $"c_acctbal",
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .filter($"rn" <= 5)
          .orderBy($"c_nationkey", $"rn")
      },
      Some("""
        SELECT * FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 CAST(row_number() OVER w AS INTEGER) AS rn,
                 CAST(rank()       OVER w AS INTEGER) AS rnk,
                 CAST(dense_rank() OVER w AS INTEGER) AS drnk,
                 CAST(ntile(4)     OVER w AS INTEGER) AS quartile
          FROM customer
          WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        ) WHERE rn <= 5
        ORDER BY c_nationkey, rn""")),

    Q(
      "q21_window_analytic",
      "lag / lead / first_value over per-user event sequences. Window " +
        "ordered by (ts, event_id); oracle casts ts to µs so ns-precision " +
        "ordering can't diverge from Spark's µs timestamps.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.t(s, dir, "events")
          .select(
            $"user_id", $"event_id", $"value",
            round(lag($"value", 1).over(w), 2).as("prev_value"),
            round(lead($"value", 1).over(w), 2).as("next_value"),
            round(first($"value").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("first_value"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        SELECT user_id, event_id, value,
               round(lag(value, 1)  OVER w, 2) AS prev_value,
               round(lead(value, 1) OVER w, 2) AS next_value,
               round(first_value(value) OVER
                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        ORDER BY user_id, event_id""")),

    Q(
      "q22_window_rows_frame",
      "Aggregates over ROWS frames: running sum + 3-row moving average per " +
        "user.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.t(s, dir, "events")
          .select(
            $"user_id", $"event_id",
            round(sum($"value").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_sum"),
            round(avg($"value").over(w.rowsBetween(-2, 0)), 4).as("moving_avg3"))
          .orderBy($"user_id", $"event_id")
      },
      Some("""
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
               round(avg(value) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg3
        FROM events
        ORDER BY user_id, event_id""")),

    Q(
      "q23_window_range_frame",
      "RANGE frame over a numeric ordering: for each order, how many orders " +
        "in the same priority fall within 1000.0 below its totalprice. " +
        "Value-based frames are tiebreak-insensitive, so this is exactly " +
        "reproducible.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
          .rangeBetween(-1000L, 0L)
        Tables.t(s, dir, "orders")
          .select(
            $"o_orderkey", $"o_orderpriority", $"o_totalprice",
            count(lit(1)).over(w).as("n_within_1000_below"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000_below
        FROM orders
        ORDER BY o_orderkey""")),

    Q(
      "q24_topk_per_group",
      "Per-group top-k (k=3 priciest parts per brand) via row_number ≤ k — " +
        "the scalable top-k idiom: rank inside each group, no global sort.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
        Tables.t(s, dir, "part")
          .select($"p_brand", $"p_partkey", $"p_retailprice",
            row_number().over(w).as("rn"))
          .filter($"rn" <= 3)
          .orderBy($"p_brand", $"rn")
      },
      Some("""
        SELECT * FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 CAST(row_number() OVER (PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
          FROM part
        ) WHERE rn <= 3
        ORDER BY p_brand, rn""")),

    Q(
      "q25_pivot",
      "Pivot (long→wide): per-user spend by event_type with explicit pivot " +
        "values (explicit list keeps the plan single-pass; no distinct-scan).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .groupBy($"user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(round(sum($"value"), 2))
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id,
               round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
               round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
               round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
               round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
               round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
        FROM events
        GROUP BY user_id
        ORDER BY user_id"""))
  )
}
