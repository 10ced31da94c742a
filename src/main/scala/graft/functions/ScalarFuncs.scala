package graft.functions

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function capability surface (SURVEY.md §2B "Scalar functions"):
  * string / date / math / JSON / array + higher-order functions, all from
  * `org.apache.spark.sql.functions._` — codegen'd expressions, zero UDFs.
  *
  * The reference's only expression evaluation is positional casting of the
  * OpenSky state vector (opensky_plugin.go:165-168); everything here is the
  * query-side surface the reference delegates to MySQL. Oracles cast
  * DuckDB's wider return types (BIGINT length/year, DOUBLE ceil) to match
  * Spark's types exactly.
  */
object ScalarFuncs extends QueryModule {

  override def queries: Seq[Q] = Seq(
    Q(
      "q32_string_funcs",
      "String surface: upper/lower, length, substring, concat_ws, trim, " +
        "lpad, replace, reverse — all codegen'd, no UDFs.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "part")
          .select(
            $"p_partkey",
            upper($"p_name").as("name_upper"),
            lower($"p_brand").as("brand_lower"),
            length($"p_name").as("name_len"),
            substring($"p_name", 1, 5).as("name_head"),
            concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
            lpad($"p_partkey".cast("string"), 8, "0").as("key_padded"),
            regexp_replace($"p_name", " ", "_").as("name_snake"),
            reverse($"p_brand").as("brand_rev"))
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey,
               upper(p_name)                         AS name_upper,
               lower(p_brand)                        AS brand_lower,
               CAST(length(p_name) AS INTEGER)       AS name_len,
               substr(p_name, 1, 5)                  AS name_head,
               concat_ws('/', p_brand, p_type)       AS brand_type,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
               replace(p_name, ' ', '_')             AS name_snake,
               reverse(p_brand)                      AS brand_rev
        FROM part
        ORDER BY p_partkey""")),

    Q(
      "q33_date_funcs",
      "Date/time surface: year/month/day extraction, quarter, date_trunc, " +
        "last_day, epoch seconds, day difference from a fixed origin.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("o_year"),
            month($"o_orderdate").as("o_month"),
            dayofmonth($"o_orderdate").as("o_day"),
            quarter($"o_orderdate").as("o_quarter"),
            date_trunc("month", $"o_orderdate").cast("timestamp_ntz").as("month_start"),
            last_day($"o_orderdate").as("month_end"),
            unix_timestamp($"o_orderdate").as("epoch_s"),
            datediff($"o_orderdate", lit("1995-01-01").cast("date")).as("days_since_95"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER)       AS o_year,
               CAST(month(o_orderdate) AS INTEGER)      AS o_month,
               CAST(day(o_orderdate) AS INTEGER)        AS o_day,
               CAST(quarter(o_orderdate) AS INTEGER)    AS o_quarter,
               CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP)
                                                        AS month_start,
               last_day(CAST(o_orderdate AS DATE))      AS month_end,
               CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
                                                        AS days_since_95
        FROM orders
        ORDER BY o_orderkey""")),

    Q(
      "q34_math_funcs",
      "Math surface: abs, ceil/floor, sqrt, power, ln, log10, exp, modulo, " +
        "greatest/least.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "lineitem")
          .filter($"l_orderkey" % 100 === 0)
          .select(
            $"l_orderkey", $"l_linenumber",
            abs($"l_extendedprice" - 1000.0).as("abs_diff"),
            ceil($"l_quantity").as("qty_ceil"),
            floor($"l_quantity").as("qty_floor"),
            round(sqrt($"l_extendedprice"), 6).as("price_sqrt"),
            round(pow($"l_discount" + 1.0, 2.0), 6).as("disc_sq"),
            round(log($"l_extendedprice" + 1.0), 6).as("price_ln"),
            round(log10($"l_extendedprice" + 1.0), 6).as("price_log10"),
            round(exp($"l_discount"), 6).as("disc_exp"),
            ($"l_orderkey" % 7).as("key_mod7"),
            greatest($"l_quantity", $"l_discount" * 100.0).as("greatest_v"),
            least($"l_tax", $"l_discount").as("least_v"))
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 1000.0)             AS abs_diff,
               CAST(ceil(l_quantity) AS BIGINT)          AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT)         AS qty_floor,
               round(sqrt(l_extendedprice), 6)           AS price_sqrt,
               round(pow(l_discount + 1.0, 2.0), 6)      AS disc_sq,
               round(ln(l_extendedprice + 1.0), 6)       AS price_ln,
               round(log10(l_extendedprice + 1.0), 6)    AS price_log10,
               round(exp(l_discount), 6)                 AS disc_exp,
               l_orderkey % 7                            AS key_mod7,
               greatest(l_quantity, l_discount * 100.0)  AS greatest_v,
               least(l_tax, l_discount)                  AS least_v
        FROM lineitem
        WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, l_linenumber""")),

    Q(
      "q35_json_funcs",
      "JSON surface over events.props (the analogue of the reference's " +
        "`sensors JSON` column, opensky_plugin.go:49): get_json_object " +
        "extraction + typed cast + aggregation.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .select(
            $"event_type",
            get_json_object($"props", "$.k").cast("int").as("k"))
          .groupBy($"event_type")
          .agg(
            sum($"k").as("sum_k"),
            count($"k").as("n_with_k"),
            round(avg($"k"), 4).as("avg_k"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               CAST(sum(k) AS BIGINT)  AS sum_k,
               count(k)                AS n_with_k,
               round(avg(k), 4)        AS avg_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events)
        GROUP BY event_type
        ORDER BY event_type""")),

    Q(
      "q36_array_funcs",
      "Array surface over tokenized text: split, size, array_distinct, " +
        "array_contains, sort_array, array_join on a slice.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(
            $"doc_id",
            split(trim($"text"), " ").as("toks"))
          .select(
            $"doc_id",
            size($"toks").as("n_tokens"),
            size(array_distinct($"toks")).as("n_unique"),
            array_contains($"toks", "spark").as("has_spark"),
            array_join(slice(sort_array($"toks"), 1, 3), ",").as("first3_sorted"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(toks) AS INTEGER)                   AS n_tokens,
               CAST(len(list_distinct(toks)) AS INTEGER)    AS n_unique,
               list_contains(toks, 'spark')                 AS has_spark,
               array_to_string(list_sort(toks)[1:3], ',')   AS first3_sorted
        FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
        ORDER BY doc_id""")),

    Q(
      "q87_date_arithmetic",
      "Date arithmetic: day/month offsets, truncation-free shifting — the " +
        "retention/cohort bread and butter.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .select(
            $"o_orderkey",
            date_add($"o_orderdate".cast("date"), 30).as("plus_30d"),
            date_sub($"o_orderdate".cast("date"), 7).as("minus_7d"),
            add_months($"o_orderdate".cast("date"), 2).as("plus_2m"),
            trunc($"o_orderdate".cast("date"), "year").as("year_start"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 30                      AS plus_30d,
               CAST(o_orderdate AS DATE) - 7                       AS minus_7d,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
               CAST(date_trunc('year', CAST(o_orderdate AS DATE)) AS DATE) AS year_start
        FROM orders
        ORDER BY o_orderkey""")),

    Q(
      "q88_string_advanced",
      "Positional string surface: strpos/instr, split_part, left/right, " +
        "repeat, starts/ends predicates.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "part")
          .select(
            $"p_partkey",
            instr($"p_type", "E").as("first_e"),
            split_part($"p_name", lit(" "), lit(1)).as("first_word"),
            split_part($"p_name", lit(" "), lit(-1)).as("last_word"),
            substring($"p_brand", 0, 5).as("brand_head"),
            repeat(lit("*"), ($"p_size" % 5 + 1).cast("int")).as("stars"),
            $"p_type".startsWith("STA").as("is_standard"),
            $"p_name".endsWith("bolt").as("is_bolt"))
          .orderBy($"p_partkey")
      },
      Some("""
        SELECT p_partkey,
               CAST(strpos(p_type, 'E') AS INTEGER)   AS first_e,
               split_part(p_name, ' ', 1)             AS first_word,
               split_part(p_name, ' ', -1)            AS last_word,
               substr(p_brand, 1, 5)                  AS brand_head,
               repeat('*', CAST(p_size % 5 + 1 AS INTEGER)) AS stars,
               starts_with(p_type, 'STA')             AS is_standard,
               suffix(p_name, 'bolt')                 AS is_bolt
        FROM part
        ORDER BY p_partkey""")),

    Q(
      "q89_regexp_filters",
      "Regex predicates and extraction in the RE2/Java-compatible subset: " +
        "rlike filters + anchored extraction feeding an aggregate.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "part")
          .filter($"p_name".rlike("^(red|blue) "))
          .select(
            regexp_extract($"p_name", "^(red|blue) ([a-z]+)$", 2).as("item"),
            regexp_extract($"p_name", "^(red|blue)", 1).as("color"))
          .groupBy($"color", $"item")
          .agg(count(lit(1)).as("n"))
          .orderBy($"color", $"item")
      },
      Some("""
        SELECT regexp_extract(p_name, '^(red|blue) ([a-z]+)$', 2) AS item,
               regexp_extract(p_name, '^(red|blue)', 1)           AS color,
               count(*) AS n
        FROM part
        WHERE regexp_matches(p_name, '^(red|blue) ')
        GROUP BY color, item
        ORDER BY color, item""")),

    Q(
      "q37_higher_order_funcs",
      "Higher-order functions over the 64-dim embedding vectors: aggregate " +
        "(fold) for the squared L2 norm, filter+size for positive-component " +
        "count, transform for scaling — the codegen'd path for vector math " +
        "(SURVEY §2B similarity-search groundwork; no UDFs).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "embeddings")
          .select(
            $"vec_id",
            round(aggregate($"embedding", lit(0.0d),
              (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("norm_sq"),
            size(filter($"embedding", x => x > 0.0f)).as("n_pos"),
            round(aggregate($"embedding", lit(0.0d),
              (acc, x) => acc + x.cast("double")), 6).as("sum_components"))
          .orderBy($"vec_id")
      },
      Some("""
        SELECT vec_id,
               round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6)  AS norm_sq,
               CAST(len(list_filter(embedding, x -> x > 0.0)) AS INTEGER) AS n_pos,
               round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 6)                      AS sum_components
        FROM embeddings
        ORDER BY vec_id""")),

    Q(
      "q102_variant_json",
      "Semi-structured VARIANT path (Spark 4): parse_json once into a " +
        "binary VARIANT column, then typed variant_get extraction feeding " +
        "a normal aggregate — the shred-on-read shape for ragged event " +
        "payloads. At 100 TB this beats string get_json_object per field: " +
        "one parse, many typed reads, and the aggregate shuffles only " +
        "(event_type, partial sums), never the payloads.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .select($"event_type",
            variant_get(parse_json($"props"), "$.k", "int").as("k"))
          .groupBy($"event_type")
          .agg(
            count(when($"k" > 50, 1)).as("n_high"),
            sum($"k").as("sum_k"),
            max($"k").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""
        WITH e AS (SELECT event_type,
                          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                   FROM events)
        SELECT event_type,
               count(*) FILTER (k > 50)      AS n_high,
               CAST(sum(k) AS BIGINT)        AS sum_k,
               CAST(max(k) AS INTEGER)       AS max_k
        FROM e
        GROUP BY event_type
        ORDER BY event_type""")),

    Q(
      "q104_map_funcs",
      "Map-typed columns end to end: per-user event-type counts collected " +
        "into a MapType via map_from_entries, a computed total merged in " +
        "with map_concat (total from an aggregate HOF over map_values), " +
        "then exploded back to rows. One shuffle on (user_id, event_type) " +
        "partials + one on user_id; maps stay small (bounded by the " +
        "event-type vocabulary), so state per key is O(|types|) not O(rows).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .filter($"user_id" < 50)
          .groupBy($"user_id", $"event_type")
          .agg(count(lit(1)).as("n"))
          // array_sort before map_from_entries: collect_list order is
          // nondeterministic, the sorted entry array is not
          .groupBy($"user_id")
          .agg(map_from_entries(array_sort(
            collect_list(struct($"event_type", $"n")))).as("m"))
          .select($"user_id",
            map_concat($"m",
              map(lit("all"),
                aggregate(map_values($"m"), lit(0L), (acc, x) => acc + x))).as("m"))
          .select($"user_id", explode($"m").as(Seq("k", "n")))
          .orderBy($"user_id", $"k")
      },
      Some("""
        WITH c AS (SELECT user_id, event_type AS k, count(*) AS n
                   FROM events WHERE user_id < 50 GROUP BY 1, 2)
        SELECT user_id, k, n FROM c
        UNION ALL
        SELECT user_id, 'all' AS k, CAST(sum(n) AS BIGINT) AS n
        FROM c GROUP BY user_id
        ORDER BY user_id, k"""))
  )
}
