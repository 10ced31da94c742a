package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SQL-surface features exercised through `spark.sql` over temp views:
  * scalar / IN / correlated-EXISTS subqueries, CTEs, HAVING (SURVEY.md §3.3:
  * the reference's "query interface" was raw SQL strings against MySQL; here
  * the same text goes through Catalyst parse→analyze→optimize→execute).
  *
  * The SQL is written in the ANSI subset shared by Spark and DuckDB, so the
  * query text doubles as its own oracle.
  */
object SqlFeatures extends QueryModule {

  private def sqlQ(name: String, doc: String, sql: String): Q =
    Q(name, doc, (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) }, Some(sql))

  override def queries: Seq[Q] = Seq(
    sqlQ(
      "q38_scalar_subquery",
      "Uncorrelated scalar subquery in WHERE (orders above global mean).",
      """
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),

    sqlQ(
      "q39_in_subquery",
      "IN subquery (semi-join after Catalyst rewrite): customers in nations " +
        "of region ASIA.",
      """
      SELECT c_nationkey, count(*) AS n_customers
      FROM customer
      WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                                  WHERE r_name = 'ASIA'))
      GROUP BY c_nationkey
      ORDER BY c_nationkey"""),

    sqlQ(
      "q40_exists_correlated",
      "Correlated EXISTS (decorrelated to a semi-join by Catalyst): " +
        "customers with any order above 400000.",
      """
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      ORDER BY c_custkey"""),

    sqlQ(
      "q41_cte",
      "WITH (CTE) chaining: yearly revenue then year-over-year comparison " +
        "via self-join of the CTE.",
      """
      WITH yearly AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1
      )
      SELECT a.yr AS yr, a.revenue AS revenue, b.revenue AS prev_revenue
      FROM yearly a LEFT JOIN yearly b ON b.yr = a.yr - 1
      ORDER BY yr"""),

    sqlQ(
      "q77_lateral_join",
      "Correlated LATERAL subquery join: for each region, the top-2 " +
        "nations by customer count — per-row subquery semantics planned " +
        "as a join by Catalyst's decorrelation.",
      """
      SELECT r_name, t.n_name, t.n_customers
      FROM region,
      LATERAL (
        SELECT n_name, count(*) AS n_customers
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY n_customers DESC, n_name
        LIMIT 2
      ) t
      ORDER BY r_name, t.n_customers DESC, t.n_name"""),

    sqlQ(
      "q78_bitwise_agg",
      "Bitwise aggregates (bit_and / bit_or / bit_xor) over per-group key " +
        "sets.",
      """
      SELECT l_returnflag,
             bit_and(l_linenumber) AS and_bits,
             bit_or(l_linenumber)  AS or_bits,
             bit_xor(l_linenumber) AS xor_bits
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),

    Q(
      "q79_try_cast",
      "Error-tolerant casting: try_cast yields NULL on malformed input " +
        "instead of failing the job (the ANSI-safe ingestion idiom). " +
        "JSON extraction spelled per engine (get_json_object vs " +
        "json_extract_string).",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT event_type,
                 count(try_cast(event_type AS INTEGER)) AS n_numeric_types,
                 count(try_cast(get_json_object(props, '$.k') AS INTEGER)) AS n_numeric_k,
                 count(*) AS n
          FROM events
          GROUP BY event_type
          ORDER BY event_type""")
      },
      Some("""
        SELECT event_type,
               count(try_cast(event_type AS INTEGER)) AS n_numeric_types,
               count(try_cast(json_extract_string(props, '$.k') AS INTEGER)) AS n_numeric_k,
               count(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    sqlQ(
      "q42_having",
      "GROUP BY … HAVING post-aggregate filter.",
      """
      SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem
      GROUP BY l_suppkey
      HAVING count(*) > 550
      ORDER BY l_suppkey"""),

    sqlQ(
      "q109_recursive_cte",
      "WITH RECURSIVE (Spark 4's UnionLoop execution): a recursively " +
        "generated year spine LEFT-joined against orders, so empty years " +
        "survive with zero counts — the calendar-scaffold pattern that " +
        "needs recursion only for the spine; the fact-side join/agg stays " +
        "a normal one-shuffle plan the optimizer handles as usual.",
      """
      WITH RECURSIVE yrs AS (
        SELECT 1992 AS yr
        UNION ALL
        SELECT yr + 1 FROM yrs WHERE yr < 1998
      )
      SELECT yrs.yr,
             count(o_orderkey)                        AS n_orders,
             round(coalesce(sum(o_totalprice), 0), 2) AS revenue
      FROM yrs LEFT JOIN orders
        ON CAST(year(o_orderdate) AS INTEGER) = yrs.yr
      GROUP BY yrs.yr
      ORDER BY yrs.yr"""),

    sqlQ(
      "q110_group_by_all",
      "GROUP BY ALL / ORDER BY ALL (the DuckDB-originated shorthand both " +
        "engines now parse): grouping keys inferred from the non-aggregate " +
        "select items — same two-phase hash aggregate plan as an explicit " +
        "key list.",
      """
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS n, round(sum(o_totalprice), 2) AS revenue
      FROM orders
      GROUP BY ALL
      ORDER BY ALL"""),

    Q(
      "q348_explode_outer_semantics",
      "GENERATOR OUTER SEMANTICS — explode vs explode_outer on " +
        "empty-array rows, the LATERAL VIEW OUTER gap that silently " +
        "drops entities from per-item pipelines: filtering each doc's " +
        "tokens to the long ones (> 6 chars) leaves ~20% of docs with " +
        "an EMPTY array; plain explode drops those docs entirely " +
        "(inner-join semantics against the generated rows), while " +
        "explode_outer keeps them as a single NULL row (left-join " +
        "semantics) — the difference between 'docs with no long " +
        "tokens vanish from the audit' and 'they report zero'. " +
        "Side-by-side ledger per variant: generated rows, docs " +
        "retained, NULL rows. The oracle derives both ledgers from " +
        "the array LENGTHS (sum(len) vs sum(greatest(len, 1))) — an " +
        "independent closed-form of the same semantics, so a Spark " +
        "regression in outer-generate NULL handling goes driver-red. " +
        "Both branches are one column-pruned scan + generate + " +
        "1-row aggregate; at 100 TB the generate is map-side only.",
      (s, dir) => {
        import s.implicits._
        val d = Tables.t(s, dir, "documents")
          .select($"doc_id", expr(
            "filter(split(trim(text), ' '), t -> length(t) > 6)")
            .as("arr"))
        def ledger(df: org.apache.spark.sql.DataFrame, kind: String) =
          df.agg(count(lit(1)).as("rows_out"),
            countDistinct($"doc_id").as("docs_retained"),
            sum(when($"tok".isNull, 1L).otherwise(0L)).as("null_rows"))
            .withColumn("variant", lit(kind))
        ledger(d.select($"doc_id", explode($"arr").as("tok")), "inner")
          .unionAll(ledger(
            d.select($"doc_id", explode_outer($"arr").as("tok")),
            "outer"))
          .select($"variant", $"rows_out", $"docs_retained",
            $"null_rows")
          .orderBy($"variant")
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 len(list_filter(string_split(trim(text), ' '),
                     t -> length(t) > 6)) AS n
          FROM documents)
        SELECT variant, rows_out, docs_retained, null_rows
        FROM (
          SELECT 'inner' AS variant,
                 CAST(sum(n) AS BIGINT) AS rows_out,
                 CAST(count(*) FILTER (WHERE n > 0) AS BIGINT)
                   AS docs_retained,
                 CAST(0 AS BIGINT) AS null_rows
          FROM d
          UNION ALL
          SELECT 'outer' AS variant,
                 CAST(sum(greatest(n, 1)) AS BIGINT) AS rows_out,
                 CAST(count(*) AS BIGINT) AS docs_retained,
                 CAST(count(*) FILTER (WHERE n = 0) AS BIGINT)
                   AS null_rows
          FROM d)
        ORDER BY variant"""))
  )
}
