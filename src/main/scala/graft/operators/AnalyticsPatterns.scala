package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic event-analytics patterns over the events table — the composed
  * workloads a pipeline engine actually serves (each is pure built-ins:
  * the point is the declarative composition, all shuffles on keyed
  * columns).
  */
object AnalyticsPatterns extends QueryModule {

  override def queries: Seq[Q] = Seq(
    Q(
      "q90_dedup_keep_first",
      "Keep-first dedup: one row per (user, day) — the earliest event — " +
        "via row_number over event time with id tiebreak. The " +
        "deterministic form of dropDuplicates for ordered data.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
        Tables.t(s, dir, "events")
          .withColumn("day", to_date($"ts"))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"day", $"event_id".as("first_event_id"),
            $"event_type".as("first_event_type"))
          .orderBy($"user_id", $"day")
      },
      Some("""
        SELECT user_id, day, event_id AS first_event_id, event_type AS first_event_type
        FROM (
          SELECT user_id, CAST(ts AS DATE) AS day, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
          FROM events)
        WHERE rn = 1
        ORDER BY user_id, day""")),

    Q(
      "q91_cohort_retention",
      "Cohort retention: users grouped by first-activity week (weekly " +
        "cohorts), counted by how many returned in a later week — " +
        "first-touch attribution + self-referential aggregate. Weeks are " +
        "date_trunc('week') DATES (year-qualified and totally ordered), " +
        "not weekofyear numbers, which alias across year boundaries.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
        val first = ev.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
        ev.join(first, Seq("user_id"))
          .groupBy($"cohort_wk")
          .agg(
            countDistinct($"user_id").as("cohort_size"),
            countDistinct(when($"wk" > $"cohort_wk", $"user_id")).as("n_retained"))
          .orderBy($"cohort_wk")
      },
      Some("""
        WITH ev AS (SELECT user_id,
                           CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
                    FROM events),
        first AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
        SELECT cohort_wk,
               count(DISTINCT ev.user_id) AS cohort_size,
               count(DISTINCT CASE WHEN wk > cohort_wk THEN ev.user_id END) AS n_retained
        FROM ev JOIN first USING (user_id)
        GROUP BY cohort_wk
        ORDER BY cohort_wk""")),

    Q(
      "q99_hash_sample",
      "Reproducible content-hash sampling (~20% of documents): a row is " +
        "in the sample iff the first md5 byte of its key is < 0x33 — the " +
        "deterministic, engine-independent, join-stable form of sampling " +
        "a 100 TB training pipeline needs (rerunning ANY subset of the " +
        "data yields the same membership, unlike seeded RNG sampling " +
        "whose draw depends on partitioning). Verified bit-exact against " +
        "DuckDB computing the same md5 predicate.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .filter(substring(md5($"doc_id".cast("string")), 1, 2) < "33")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_sampled"),
            // floor-truncated mean from the integer sum: IEEE-identical on
            // both engines (round() ties on .00005 boundaries are not)
            (floor(sum($"n_chars") * 10000.0 / count(lit(1))) / 10000.0).as("avg_chars"))
          .orderBy($"source")
      },
      Some("""
        SELECT source, count(*) AS n_sampled,
               floor(sum(n_chars) * 10000.0 / count(*)) / 10000.0 AS avg_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '33'
        GROUP BY source
        ORDER BY source""")),

    Q(
      "q92_funnel_click_to_purchase",
      "Funnel: per user, first click and whether a purchase followed " +
        "within 24h — conditional aggregation over per-user min times, no " +
        "self-join (one pass + one small agg).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "events")
          .groupBy($"user_id")
          .agg(
            min(when($"event_type" === "click", $"ts")).as("first_click"),
            min(when($"event_type" === "purchase", $"ts")).as("first_purchase"))
          .filter($"first_click".isNotNull)
          .select(
            $"user_id",
            ($"first_purchase".isNotNull &&
              $"first_purchase" > $"first_click" &&
              $"first_purchase" <= $"first_click" + expr("INTERVAL 24 HOURS"))
              .as("converted_24h"))
          .groupBy($"converted_24h")
          .agg(count(lit(1)).as("n_users"))
          .orderBy($"converted_24h")
      },
      Some("""
        WITH f AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS first_click,
                 min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
          FROM events
          GROUP BY user_id)
        SELECT (first_purchase IS NOT NULL AND first_purchase > first_click
                AND first_purchase <= first_click + INTERVAL 24 HOUR) AS converted_24h,
               count(*) AS n_users
        FROM f
        WHERE first_click IS NOT NULL
        GROUP BY 1
        ORDER BY converted_24h""")),

    Q(
      "q107_stratified_sample",
      "Stratified deterministic sampling: exactly 20 orders per priority " +
        "stratum, chosen by md5(key) order — reproducible across engines " +
        "and runs (md5 renders identically here and in DuckDB, see q99). " +
        "One shuffle on the stratum key; this window form sorts every " +
        "stratum row, so at 100 TB use q132 — the SAME sample from the " +
        "bounded FirstKByKey Aggregator with O(k) state (implemented, " +
        "same oracle).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "orders")
          .withColumn("rk", row_number().over(
            Window.partitionBy($"o_orderpriority")
              .orderBy(md5($"o_orderkey".cast("string")), $"o_orderkey")))
          .filter($"rk" <= 20)
          .select($"o_orderpriority", $"o_orderkey", $"o_totalprice", $"rk")
          .orderBy($"o_orderpriority", $"rk")
      },
      Some("""
        WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
                          row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
                   FROM orders)
        SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
        FROM r WHERE rk <= 20
        ORDER BY o_orderpriority, rk""")),

    Q(
      "q137_corpus_pipeline",
      "END-TO-END corpus build — the acceptance test that the kernels " +
        "COMPOSE: quality filter (q129's keep rule) → exact content " +
        "dedup with deterministic keep-smallest survivor (q60's rule) → " +
        "incremental-stable train/val/test split (q116's md5 rule) → " +
        "per-split audit, all one declarative DAG Catalyst optimizes " +
        "end to end (the filter prunes before the dedup shuffle; the " +
        "split adds no shuffle at all). This is the nightly job a " +
        "training-data team actually ships; oracled by chaining the " +
        "same stages in SQL.",
      (s, dir) => {
        import s.implicits._
        val t = filter(split(trim($"text"), " "), x => x =!= lit(""))
        val len = greatest(size(t) - 1, lit(0))
        val scored = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang", $"text",
            size(t).as("n_tok"),
            size(array_distinct(t)).as("n_uniq"),
            zip_with(slice(t, lit(1), len), slice(t, lit(2), len),
              (a, b) => concat(a, lit("\u001f"), b)).as("bi"))
          .select($"doc_id", $"lang", $"text", $"n_tok",
            when($"n_tok" === 0, 0.0)
              .otherwise($"n_uniq".cast("double") / $"n_tok").as("ttr"),
            when(size($"bi") === 0, 0.0)
              .otherwise((size($"bi") - size(array_distinct($"bi")))
                .cast("double") / size($"bi")).as("dup_frac"))
        val kept = scored
          .filter($"n_tok" >= 10 && $"dup_frac" <= 0.2 && $"ttr" >= 0.3)
        // keep-first via window: ONE shuffle on text (the groupBy-min +
        // semi-join form costs a second shuffle on doc_id)
        val wText = Window.partitionBy($"text").orderBy($"doc_id")
        val b = substring(md5($"doc_id".cast("string")), 1, 2)
        kept.withColumn("rn", row_number().over(wText)).filter($"rn" === 1)
          .withColumn("split",
            when(b < "cd", "train").when(b < "e6", "val").otherwise("test"))
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"lang").as("n_langs"),
            sum($"n_tok").cast("long").as("total_tokens"),
            min($"doc_id").as("d_min"), max($"doc_id").as("d_max"))
          .orderBy($"split")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang, text,
                 list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
          FROM documents),
        sig AS (
          SELECT doc_id, lang, text, len(t) AS n_tok,
                 CASE WHEN len(t) = 0 THEN 0.0
                      ELSE CAST(len(list_distinct(t)) AS DOUBLE) / len(t) END AS ttr,
                 CASE WHEN len(t) < 2 THEN 0.0
                      ELSE CAST(len(b) - len(list_distinct(b)) AS DOUBLE) / len(b)
                      END AS dup_frac
          FROM (SELECT doc_id, lang, text, t,
                       [t[i] || chr(31) || t[i+1] for i in range(1, len(t))] AS b
                FROM toks)),
        kept AS (
          SELECT * FROM sig
          WHERE n_tok >= 10 AND dup_frac <= 0.2 AND ttr >= 0.3),
        dd AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
            FROM kept)
          WHERE rn = 1),
        sp AS (
          SELECT *,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                        THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                        THEN 'val'
                      ELSE 'test' END AS split
          FROM dd)
        SELECT split, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
               CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               min(doc_id) AS d_min, max(doc_id) AS d_max
        FROM sp GROUP BY split ORDER BY split""")),

    Q(
      "q135_passage_chunking",
      "RAG-style PASSAGE CHUNKING: each document's token stream is cut " +
        "into 64-token windows at stride 48 (16-token overlap, so no " +
        "boundary sentence is lost to retrieval) — the chunker every " +
        "retrieval corpus build runs. chunk_idx = start/stride is a pure " +
        "function of the start offset, so the output is partitioning-" +
        "invariant; emitted spans carry (start, length, first/last " +
        "token) for audit. Per-row generate + project: zero shuffle " +
        "until the final sort, linear at any scale.",
      (s, dir) => {
        import s.implicits._
        val W = 64; val S = 48
        Tables.t(s, dir, "documents")
          .select($"doc_id", split(trim($"text"), " ").as("t"))
          .filter(size($"t") >= 1)
          .select($"doc_id", $"t", size($"t").as("n"),
            explode(sequence(lit(0), size($"t") - 1, lit(S))).as("s"))
          .select($"doc_id",
            ($"s" / S).cast("int").as("chunk_idx"),
            $"s".cast("int").as("tok_start"),
            least(lit(W), $"n" - $"s").cast("int").as("n_tokens"),
            element_at($"t", $"s" + 1).as("first_tok"),
            element_at($"t", $"s" + least(lit(W), $"n" - $"s")).as("last_tok"))
          .orderBy($"doc_id", $"chunk_idx")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
        st AS (
          SELECT doc_id, t, len(t) AS n, unnest(range(0, len(t), 48)) AS s
          FROM toks WHERE len(t) >= 1)
        SELECT doc_id,
               CAST(s // 48 AS INTEGER) AS chunk_idx,
               CAST(s AS INTEGER) AS tok_start,
               CAST(least(64, n - s) AS INTEGER) AS n_tokens,
               t[s + 1] AS first_tok,
               t[s + least(64, n - s)] AS last_tok
        FROM st
        ORDER BY doc_id, chunk_idx""")),

    Q(
      "q132_stratified_sample_agg",
      "q107's sampling answer from the SCALE-PATH plan its doc promises: " +
        "the same exact 20-per-stratum md5-ordered sample, but via the " +
        "bounded FirstKByKey Aggregator (udaf) instead of a row_number " +
        "window — O(k) aggregation state per stratum with map-side " +
        "partials, so no stratum ever materializes or sorts on one task. " +
        "Same DuckDB oracle as q107: identical results, different (and " +
        "100 TB-safe) physical shape — the q56-vs-q66 contrast, applied " +
        "to sampling.",
      (s, dir) => {
        import graft.functions.{FirstKByKey, SampleHit}
        import s.implicits._
        val firstK = udaf(new FirstKByKey(20))
        Tables.t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(firstK(
            md5($"o_orderkey".cast("string")), $"o_orderkey", $"o_totalprice")
            .as("sample"))
          .select($"o_orderpriority", posexplode($"sample").as(Seq("pos", "hit")))
          .select($"o_orderpriority",
            $"hit.key".as("o_orderkey"),
            $"hit.payload".as("o_totalprice"),
            ($"pos" + 1).cast("int").as("rk"))
          .orderBy($"o_orderpriority", $"rk")
      },
      Some("""
        WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
                          row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rk
                   FROM orders)
        SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
        FROM r WHERE rk <= 20
        ORDER BY o_orderpriority, rk""")),

    Q(
      "q116_train_split",
      "Deterministic train/val/test split (~80/10/10): assignment is a " +
        "pure function of the stable doc key's md5 (first hex byte " +
        "< 0xcd → train, < 0xe6 → val, else test), so membership is " +
        "reproducible across engines, runs, partitionings, and " +
        "INCREMENTAL arrivals — a new document's split never perturbs " +
        "existing assignments, which seeded-RNG splits cannot guarantee. " +
        "Narrow projection + one shuffle on (source, split) for the " +
        "audit counts; the assignment itself is shuffle-free at any " +
        "scale.",
      (s, dir) => {
        import s.implicits._
        val b = substring(md5($"doc_id".cast("string")), 1, 2)
        Tables.t(s, dir, "documents")
          .withColumn("split",
            when(b < "cd", "train").when(b < "e6", "val").otherwise("test"))
          .groupBy($"source", $"split")
          .agg(count(lit(1)).as("n_docs"),
            min($"doc_id").as("d_min"), max($"doc_id").as("d_max"))
          .orderBy($"source", $"split")
      },
      Some("""
        SELECT source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs, min(doc_id) AS d_min, max(doc_id) AS d_max
        FROM documents
        GROUP BY 1, 2
        ORDER BY source, split""")),

    Q(
      "q117_sequence_packing",
      "GPT-style sequence packing (concat-then-chunk): documents in " +
        "global doc_id order are laid head-to-tail on one token tape and " +
        "cut into fixed 512-token training chunks; output maps each " +
        "chunk to the docs it straddles. The global running token offset " +
        "is computed SCALABLY — two-phase: per-bucket prefix sums in " +
        "parallel, then a buckets-sized offset table (a window over " +
        "#buckets rows, broadcast back) — never a single-partition " +
        "window over the corpus, which is the naive formulation's " +
        "100 TB bottleneck. Buckets are DETERMINISTIC id ranges (width " +
        "= ceil(span / P) from a one-row min/max aggregate), not " +
        "spark_partition_id over repartitionByRange: the bucket frame " +
        "feeds TWO plan branches (the offset table and the final join), " +
        "and a sampled range exchange recomputed with a different " +
        "sample could silently misalign them — a pure doc_id function " +
        "cannot. Output is partitioning-invariant because the doc_id " +
        "order is total.",
      (s, dir) => {
        import s.implicits._
        val B = 512
        val P = s.sparkContext.defaultParallelism
        val toks = Tables.t(s, dir, "documents")
          .select($"doc_id",
            size(split(trim($"text"), " ")).cast("long").as("n_tok"))
          .filter($"n_tok" > 0)
        // deterministic range buckets: pid is monotone in doc_id, so pid
        // order == doc_id order (the invariant the offset window needs).
        // Even id-density is assumed (true of the fixtures); a skewed id
        // space would precompute quantile bounds ONCE and bake them in as
        // constants — still a pure function, never spark_partition_id.
        val bounds = toks.agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
        val parts = toks.crossJoin(broadcast(bounds))
          .withColumn("pid", // integer div: exact at any id magnitude
            expr(s"cast((doc_id - lo) div ((hi - lo + $P) div $P) as int)"))
          .drop("lo", "hi")
        val wLocal = Window.partitionBy($"pid").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = parts.withColumn("local_prev",
          coalesce(sum($"n_tok").over(wLocal), lit(0L)))
        // this window runs over #buckets rows, not the corpus
        val wOff = Window.orderBy($"pid").rowsBetween(Window.unboundedPreceding, -1)
        val offsets = local.groupBy($"pid").agg(sum($"n_tok").as("part_tok"))
          .withColumn("offset", coalesce(sum($"part_tok").over(wOff), lit(0L)))
          .select($"pid", $"offset")
        local.join(broadcast(offsets), Seq("pid"))
          .withColumn("start_tok", $"local_prev" + $"offset")
          .withColumn("chunk_id",
            explode(sequence(expr(s"start_tok div $B"),
              expr(s"(start_tok + n_tok - 1) div $B"))))
          .groupBy($"chunk_id")
          .agg(count(lit(1)).as("n_docs"),
            min($"doc_id").as("d_first"), max($"doc_id").as("d_last"))
          .orderBy($"chunk_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok
          FROM documents),
        cum AS (
          SELECT doc_id, n_tok,
                 CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS start_tok
          FROM toks WHERE n_tok > 0),
        spans AS (
          SELECT doc_id, CAST(start_tok // 512 AS BIGINT) AS c0,
                 CAST((start_tok + n_tok - 1) // 512 AS BIGINT) AS c1
          FROM cum),
        ch AS (SELECT doc_id, unnest(range(c0, c1 + 1)) AS chunk_id FROM spans)
        SELECT chunk_id, count(*) AS n_docs,
               min(doc_id) AS d_first, max(doc_id) AS d_last
        FROM ch GROUP BY chunk_id ORDER BY chunk_id""")),

    Q(
      "q124_corpus_mixture",
      "Training-data MIXTURE assembly: per-language sampling weights " +
        "turn a raw corpus into the mixture a training run consumes — " +
        "majority language (en) downsampled to ~25% by the md5-threshold " +
        "rule (deterministic, incremental-stable, see q99), minority " +
        "languages kept at ~75% and UPSAMPLED 2× (weight > 1 means the " +
        "kept docs repeat — explode over a sequence of epoch copies, the " +
        "standard way mixtures express >1 passes over a source). " +
        "Assignment is shuffle-free (a pure row predicate + generator); " +
        "the only shuffle is the audit aggregate. At 100 TB the same " +
        "plan holds: membership is a function of the stable key, so " +
        "re-runs and late-arriving shards agree without coordination.",
      (s, dir) => {
        import s.implicits._
        val b = substring(md5($"doc_id".cast("string")), 1, 2)
        Tables.t(s, dir, "documents")
          .withColumn("keep", when($"lang" === "en", b < "40").otherwise(b < "c0"))
          .filter($"keep")
          .withColumn("n_copies", when($"lang" === "en", 1).otherwise(2))
          .withColumn("epoch", explode(sequence(lit(1), $"n_copies")))
          .groupBy($"lang")
          .agg(
            countDistinct($"doc_id").as("n_unique"),
            count(lit(1)).as("n_rows_out"),
            sum($"n_chars").as("chars_out"))
          .orderBy($"lang")
      },
      Some("""
        WITH kept AS (
          SELECT doc_id, lang, n_chars,
                 CASE WHEN lang = 'en' THEN 1 ELSE 2 END AS n_copies
          FROM documents
          WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                  < CASE WHEN lang = 'en' THEN '40' ELSE 'c0' END),
        rep AS (SELECT doc_id, lang, n_chars,
                       unnest(range(1, n_copies + 1)) AS epoch
                FROM kept)
        SELECT lang,
               count(DISTINCT doc_id) AS n_unique,
               count(*) AS n_rows_out,
               CAST(sum(n_chars) AS BIGINT) AS chars_out
        FROM rep
        GROUP BY lang
        ORDER BY lang""")),

    Q(
      "q125_global_shuffle",
      "Deterministic global shuffle + round-robin SHARDING — the 'shuffle " +
        "the corpus once, cut into training shards' step every run does " +
        "before data loading: global order is md5 of a seeded key " +
        "(reproducible across engines, runs, and partitionings — not " +
        "seeded RNG, whose draw depends on the physical split), shard = " +
        "(rank-1) mod 8. The global rank is computed SCALABLY with " +
        "q117's two-phase shape: 16 DETERMINISTIC buckets (the md5's " +
        "first hex digit — a prefix of the sort key, so bucket order " +
        "refines hash order), per-bucket row_number in parallel, then a " +
        "16-row offset table broadcast back — never a single-partition " +
        "window over the corpus. Audit: per-shard doc count, language " +
        "spread, and char mass (a healthy shuffle balances all three).",
      (s, dir) => {
        import s.implicits._
        val keyed = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang", $"n_chars",
            md5(concat(lit("seed42:"), $"doc_id".cast("string"))).as("h"))
          .withColumn("b", conv(substring($"h", 1, 1), 16, 10).cast("int"))
        val wLocal = Window.partitionBy($"b").orderBy($"h", $"doc_id")
        val local = keyed.withColumn("lrk", row_number().over(wLocal))
        // offsets window runs over <=16 rows, not the corpus
        val wOff = Window.orderBy($"b").rowsBetween(Window.unboundedPreceding, -1)
        val offsets = local.groupBy($"b").agg(count(lit(1)).as("n"))
          .withColumn("off", coalesce(sum($"n").over(wOff), lit(0L)))
          .select($"b", $"off")
        local.join(broadcast(offsets), Seq("b"))
          .withColumn("shard_id", (($"off" + $"lrk" - 1) % 8).cast("int"))
          .groupBy($"shard_id")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct($"lang").as("n_langs"),
            sum($"n_chars").as("chars"))
          .orderBy($"shard_id")
      },
      Some("""
        WITH r AS (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (
                   ORDER BY md5('seed42:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
        SELECT CAST((rk - 1) % 8 AS INTEGER) AS shard_id,
               count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM r
        GROUP BY 1
        ORDER BY shard_id""")),

    Q(
      "q142_corpus_snapshot_diff",
      "CORPUS SNAPSHOT DIFF — what changed between two corpus versions " +
        "(the audit a training-data team runs before promoting a new " +
        "crawl): full-outer join of old vs new on the stable doc key, " +
        "each row classified added / removed / changed / unchanged by " +
        "comparing CONTENT HASHES, then counted. The two snapshots are " +
        "derived deterministically from the fixture corpus (old drops " +
        "doc_id%7==6, new drops %10==9 and rewrites %5==0 by appending " +
        "a byte — a corruption that alters ANY text, so the 'changed' " +
        "bucket is non-empty by construction, not by fixture luck). The " +
        "join " +
        "shuffles (doc_id, 64-hex sha256), never document bodies — at " +
        "100 TB with both snapshot dirs bucketed by doc_id the diff is " +
        "exchange-free; unbucketed it is one sort-merge join of slim " +
        "rows.",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents").select($"doc_id", $"text")
        val old = docs.filter($"doc_id" % 7 =!= 6)
          .select($"doc_id", sha2($"text", 256).as("h_old"))
        val neu = docs.filter($"doc_id" % 10 =!= 9)
          .select($"doc_id", sha2(
            when($"doc_id" % 5 === 0, concat($"text", lit("!"))).otherwise($"text"), 256)
            .as("h_new"))
        old.join(neu, Seq("doc_id"), "full_outer")
          .select($"doc_id",
            when($"h_old".isNull, "added")
              .when($"h_new".isNull, "removed")
              .when($"h_old" === $"h_new", "unchanged")
              .otherwise("changed").as("status"))
          .groupBy($"status")
          .agg(count(lit(1)).as("n_docs"),
            min($"doc_id").as("id_min"), max($"doc_id").as("id_max"))
          .orderBy($"status")
      },
      Some("""
        WITH old AS (SELECT doc_id, sha256(text) AS h_old
                     FROM documents WHERE doc_id % 7 <> 6),
        neu AS (SELECT doc_id,
                       sha256(CASE WHEN doc_id % 5 = 0 THEN text || '!'
                                   ELSE text END) AS h_new
                FROM documents WHERE doc_id % 10 <> 9)
        SELECT CASE WHEN h_old IS NULL THEN 'added'
                    WHEN h_new IS NULL THEN 'removed'
                    WHEN h_old = h_new THEN 'unchanged'
                    ELSE 'changed' END AS status,
               count(*) AS n_docs, min(doc_id) AS id_min, max(doc_id) AS id_max
        FROM old FULL OUTER JOIN neu USING (doc_id)
        GROUP BY 1
        ORDER BY status""")),

    Q(
      "q231_capped_sessions",
      "GAP + MAX-DURATION sessionization (split on a 2 h inactivity " +
        "gap OR when a session would exceed 4 h start-to-event — the " +
        "C4/analytics guard against the never-idle bot whose q143 " +
        "session spans the whole corpus): the duration cap makes this " +
        "GENUINELY SEQUENTIAL — each split decision depends on the " +
        "running session START, which itself depends on every earlier " +
        "decision, so no lag/running-sum window form exists (q143's " +
        "gaps-and-islands only works because its predicate is " +
        "pairwise). Engine: the one legitimate " +
        "KeyValueGroupedDataset.flatMapGroups use — per-user sorted " +
        "replay in a single linear pass; per-user history must fit a " +
        "task (fixture max ~10k events; an unbounded-history corpus " +
        "routes to the streaming form q182, whose ListState pays the " +
        "same bound). Oracle: a WITH RECURSIVE step-per-event replay " +
        "of the identical recurrence — iteration k resolves every " +
        "user's k-th event at once. The user_id shuffle is the only " +
        "row-scale exchange.",
      (s, dir) => {
        import s.implicits._
        val GAP = 7200000000L
        val CAP = 14400000000L
        Tables.t(s, dir, "events")
          .select($"user_id",
            unix_micros($"ts".cast("timestamp")).as("us"), $"event_id")
          .as[(Long, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (uid, it) =>
            val arr = it.toArray.sortBy(e => (e._2, e._3))
            val out = scala.collection.mutable
              .ArrayBuffer[(Long, Int, Long, Long, Long)]()
            var sessNo = 0
            var start = 0L; var prev = 0L; var n = 0L
            arr.foreach { case (_, us, _) =>
              if (n == 0L || us - prev > GAP || us - start > CAP) {
                if (n > 0L) out += ((uid, sessNo, start, prev, n))
                sessNo += 1; start = us; n = 0L
              }
              prev = us; n += 1L
            }
            if (n > 0L) out += ((uid, sessNo, start, prev, n))
            out.iterator
          }
          .toDF("user_id", "sess_no", "start_us", "end_us", "n_events")
          .orderBy($"user_id", $"sess_no")
      },
      Some("""
        WITH RECURSIVE e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        r AS (
          SELECT user_id, rn, us, 1 AS sess_no, us AS sess_start
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.rn, e.us,
                 CASE WHEN e.us - r.us > 7200000000
                        OR e.us - r.sess_start > 14400000000
                      THEN r.sess_no + 1 ELSE r.sess_no END,
                 CASE WHEN e.us - r.us > 7200000000
                        OR e.us - r.sess_start > 14400000000
                      THEN e.us ELSE r.sess_start END
          FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT user_id, CAST(sess_no AS INT) AS sess_no,
               CAST(sess_start AS BIGINT) AS start_us,
               CAST(max(us) AS BIGINT) AS end_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM r GROUP BY user_id, sess_no, sess_start
        ORDER BY user_id, sess_no""")),

    Q(
      "q143_sessionize_batch",
      "BATCH SESSIONIZATION (30-min inactivity gap) — the batch " +
        "complement of q72's streaming session window, for backfills and " +
        "reprocessing: per user, a new session starts when the gap to " +
        "the previous event exceeds 30 minutes (lag), session ids are " +
        "the running sum of those starts, then one aggregate per " +
        "(user, session). ONE shuffle on user_id; each user's events " +
        "sort within their partition, never globally — power-user skew " +
        "at 100 TB is bounded by the busiest single user, and the " +
        "running sum is a per-user window, not a global one.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.t(s, dir, "events")
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_s",
            when($"prev_ts".isNull ||
              $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1L)
              .otherwise(0L))
          .withColumn("sess_no", sum($"new_s").over(w))
          .groupBy($"user_id", $"sess_no")
          .agg(min($"ts").cast("timestamp_ntz").as("sess_start"),
            max($"ts").cast("timestamp_ntz").as("sess_end"),
            count(lit(1)).as("n_events"),
            round(sum($"value"), 2).as("sum_value"))
          .select($"user_id", $"sess_no".cast("int").as("sess_no"),
            $"sess_start", $"sess_end", $"n_events", $"sum_value")
          .orderBy($"user_id", $"sess_no")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
                 lag(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
          FROM events),
        f AS (SELECT *, CASE WHEN prev_ts IS NULL
                               OR ts > prev_ts + INTERVAL '30 minutes'
                             THEN 1 ELSE 0 END AS new_s
              FROM e),
        g AS (SELECT *, sum(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS sess_no
              FROM f)
        SELECT user_id, CAST(sess_no AS INTEGER) AS sess_no,
               min(ts) AS sess_start, max(ts) AS sess_end,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM g GROUP BY user_id, sess_no
        ORDER BY user_id, sess_no""")),

    Q(
      "q144_interval_merge",
      "OVERLAPPING-INTERVAL COALESCING (validity-period merge): each " +
        "lineitem is a supplier-busy interval [l_shipdate, l_shipdate + " +
        "l_quantity days]; overlapping intervals merge into maximal " +
        "covered periods — the classic gaps-and-islands operator (SCD " +
        "validity ranges, maintenance windows, coverage audits). An " +
        "interval opens a new island when its start exceeds the running " +
        "max end of all earlier intervals (rows-preceding max window); " +
        "island ids are the running sum of those opens. Same scale " +
        "shape as q143: one shuffle on the partition key, per-key sorts " +
        "only. l_quantity is integral (TPC-H 1..50), so the day-count " +
        "cast is exact on both engines.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"iv_start", $"iv_end", $"l_orderkey", $"l_linenumber")
        val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
        Tables.t(s, dir, "lineitem")
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
            $"l_shipdate".as("iv_start"),
            expr("l_shipdate + make_interval(0, 0, 0, CAST(l_quantity AS INT), 0, 0, 0)")
              .as("iv_end"))
          .withColumn("max_end_prev", max($"iv_end").over(wPrev))
          .withColumn("opens",
            when($"max_end_prev".isNull || $"iv_start" > $"max_end_prev", 1L)
              .otherwise(0L))
          .withColumn("island", sum($"opens").over(w))
          .groupBy($"l_suppkey", $"island")
          .agg(min($"iv_start").cast("timestamp_ntz").as("iv_start"),
            max($"iv_end").cast("timestamp_ntz").as("iv_end"),
            count(lit(1)).as("n_shipments"))
          .select($"l_suppkey", $"island".cast("int").as("island"),
            $"iv_start", $"iv_end", $"n_shipments")
          .orderBy($"l_suppkey", $"island")
      },
      Some("""
        WITH iv AS (
          SELECT l_suppkey, l_orderkey, l_linenumber,
                 CAST(l_shipdate AS TIMESTAMP) AS iv_start,
                 CAST(l_shipdate AS TIMESTAMP)
                   + CAST(l_quantity AS INTEGER) * INTERVAL '1 day' AS iv_end
          FROM lineitem),
        m AS (SELECT *, max(iv_end) OVER (
                PARTITION BY l_suppkey
                ORDER BY iv_start, iv_end, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_end_prev
              FROM iv),
        o AS (SELECT *, CASE WHEN max_end_prev IS NULL
                               OR iv_start > max_end_prev
                             THEN 1 ELSE 0 END AS opens
              FROM m),
        g AS (SELECT *, sum(opens) OVER (
                PARTITION BY l_suppkey
                ORDER BY iv_start, iv_end, l_orderkey, l_linenumber) AS island
              FROM o)
        SELECT l_suppkey, CAST(island AS INTEGER) AS island,
               min(iv_start) AS iv_start, max(iv_end) AS iv_end,
               count(*) AS n_shipments
        FROM g GROUP BY l_suppkey, island
        ORDER BY l_suppkey, island""")),

    Q(
      "q146_scd2_build",
      "SCD TYPE-2 HISTORY BUILD from a change stream — the warehouse " +
        "complement of q122's CDC merge: each user's event_type is the " +
        "tracked attribute; no-op changes (same value as the previous " +
        "event) are collapsed, surviving changes become validity rows " +
        "[valid_from, valid_to) via lead() with NULL valid_to marking " +
        "the current row. Two per-user windows (change detect, then " +
        "range close) — ONE shuffle on user_id, the second window " +
        "reuses the same partitioning (no re-exchange), per-user sorts " +
        "only.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val changes = Tables.t(s, dir, "events")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNull || $"event_type" =!= $"prev_type")
        changes
          .withColumn("valid_to", lead($"ts", 1).over(w))
          .select($"user_id", $"event_type",
            $"ts".cast("timestamp_ntz").as("valid_from"),
            $"valid_to".cast("timestamp_ntz").as("valid_to"),
            $"valid_to".isNull.as("is_current"))
          .orderBy($"user_id", $"valid_from")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type
          FROM events),
        ch AS (SELECT * FROM e
               WHERE prev_type IS NULL OR event_type <> prev_type),
        r AS (SELECT user_id, event_type, ts AS valid_from,
                     lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS valid_to
              FROM ch)
        SELECT user_id, event_type, valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM r
        ORDER BY user_id, valid_from""")),

    Q(
      "q150_pagerank_int",
      "ITERATIVE GRAPH CENTRALITY — two PageRank iterations in EXACT " +
        "integer fixed-point over the supplier↔customer interaction " +
        "graph (distinct lineitem⋈orders pairs, symmetrized): the " +
        "centrality kernel crawl-quality pipelines run on page graphs " +
        "to weight training documents. r' = 150000 + (85 * Σ " +
        "floor(r/deg)) div 100 on a 1e6 scale — every op is integer, so " +
        "the result is bit-identical on any engine, partitioning, or " +
        "summation order (float PageRank is none of those). Per " +
        "iteration: one slim (node, rank) join against edges + one " +
        "aggregate — q96's label-propagation shuffle shape; at 100 TB " +
        "the edge table is bucketed by src and the per-iteration " +
        "exchange disappears.",
      (s, dir) => {
        import s.implicits._
        pagerankInt(s, dir, iterations = 2)
          .orderBy($"rank_scaled".desc, $"node")
          .limit(20)
      },
      Some("""
        WITH e0 AS (SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS src,
                                    'C' || CAST(o_custkey AS VARCHAR) AS dst
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        ed AS (SELECT e.src, e.dst, deg.d FROM e JOIN deg USING (src)),
        s1 AS (SELECT ed.dst AS node, sum(1000000 // ed.d) AS s
               FROM ed GROUP BY ed.dst),
        r1 AS (SELECT n.node, 150000 + (85 * coalesce(s1.s, 0)) // 100 AS r
               FROM nodes n LEFT JOIN s1 USING (node)),
        s2 AS (SELECT ed.dst AS node, sum(r1.r // ed.d) AS s
               FROM ed JOIN r1 ON ed.src = r1.node GROUP BY ed.dst),
        r2 AS (SELECT n.node, 150000 + (85 * coalesce(s2.s, 0)) // 100 AS r
               FROM nodes n LEFT JOIN s2 USING (node))
        SELECT node, CAST(r AS BIGINT) AS rank_scaled
        FROM r2
        ORDER BY rank_scaled DESC, node
        LIMIT 20""")),

    Q(
      "q153_gapfill_timeseries",
      "TIME-SERIES DENSIFICATION (gap fill): per-user daily event counts " +
        "with every missing day inside the user's own [first, last] " +
        "activity span emitted as an explicit zero row — what every " +
        "downstream window/forecast consumer needs (a 7-day rolling mean " +
        "over sparse rows silently skips the gaps). The day spine is " +
        "GENERATED per user from a 2-column (user, min/max) aggregate — " +
        "map-side sequence+explode, no calendar table join, no cross " +
        "join; the fill join is keyed (user, day). Shuffles: the count " +
        "agg and the fill join, both on the user key.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select($"user_id", to_date($"ts").as("day"))
        val counts = ev.groupBy($"user_id", $"day").agg(count(lit(1)).as("n"))
        val spine = ev.groupBy($"user_id")
          .agg(min($"day").as("d0"), max($"day").as("d1"))
          .select($"user_id",
            explode(sequence($"d0", $"d1", expr("INTERVAL 1 DAY"))).as("day"))
        spine.join(counts, Seq("user_id", "day"), "left")
          .select($"user_id", $"day", coalesce($"n", lit(0L)).as("n_events"))
          .orderBy($"user_id", $"day")
      },
      Some("""
        WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        counts AS (SELECT user_id, day, count(*) AS n FROM ev GROUP BY 1, 2),
        spine AS (
          SELECT user_id,
                 CAST(unnest(generate_series(CAST(min(day) AS TIMESTAMP),
                                             CAST(max(day) AS TIMESTAMP),
                                             INTERVAL 1 DAY)) AS DATE) AS day
          FROM ev GROUP BY user_id)
        SELECT s.user_id, s.day, coalesce(c.n, 0) AS n_events
        FROM spine s LEFT JOIN counts c USING (user_id, day)
        ORDER BY s.user_id, s.day""")),

    Q(
      "q156_event_sequence",
      "STRICT-ORDER SEQUENCE DETECTION (CEP-style): users whose streams " +
        "contain click THEN view THEN purchase in that order — each " +
        "step's timestamp is the earliest qualifying event strictly " +
        "after the previous step (not the global per-type minimum, " +
        "which q92's funnel uses and which over-counts out-of-order " +
        "histories). Three conditional-min aggregates chained by two " +
        "user-keyed joins — no self-join explosion, no per-user " +
        "collect_list; every shuffle is on user_id, so the pattern " +
        "scales with users, not with event-pair combinations.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select($"user_id", $"event_type", $"ts")
        val s1 = ev.filter($"event_type" === "click")
          .groupBy($"user_id").agg(min($"ts").as("t1"))
        val s2 = ev.join(s1, Seq("user_id"))
          .filter($"event_type" === "view" && $"ts" > $"t1")
          .groupBy($"user_id").agg(min($"t1").as("t1"), min($"ts").as("t2"))
        val s3 = ev.join(s2, Seq("user_id"))
          .filter($"event_type" === "purchase" && $"ts" > $"t2")
          .groupBy($"user_id")
          .agg(min($"t1").as("t1"), min($"t2").as("t2"), min($"ts").as("t3"))
        s3.select($"user_id",
          $"t1".cast("timestamp_ntz").as("click_at"),
          $"t2".cast("timestamp_ntz").as("view_at"),
          $"t3".cast("timestamp_ntz").as("purchase_at"))
          .orderBy($"user_id")
      },
      Some("""
        WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
        s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
               WHERE event_type = 'click' GROUP BY user_id),
        s2 AS (SELECT ev.user_id, min(s1.t1) AS t1, min(ev.ts) AS t2
               FROM ev JOIN s1 USING (user_id)
               WHERE ev.event_type = 'view' AND ev.ts > s1.t1
               GROUP BY ev.user_id),
        s3 AS (SELECT ev.user_id, min(s2.t1) AS t1, min(s2.t2) AS t2,
                      min(ev.ts) AS t3
               FROM ev JOIN s2 USING (user_id)
               WHERE ev.event_type = 'purchase' AND ev.ts > s2.t2
               GROUP BY ev.user_id)
        SELECT user_id, t1 AS click_at, t2 AS view_at, t3 AS purchase_at
        FROM s3
        ORDER BY user_id""")),

    Q(
      "q166_token_budget_selection",
      "TOKEN-BUDGET CORPUS SELECTION — the 'fill the training budget " +
        "with the best documents first' step of corpus curation: docs " +
        "ranked by an integer quality score (stopword-ratio percent, " +
        "all-integer arithmetic), the greedy prefix under a 100k-token " +
        "budget selected by CUMULATIVE token count. The global running " +
        "sum — the classic single-partition-window trap — is computed " +
        "scalably with q125's two-phase shape, bucketed HERE by the " +
        "score itself (a <=101-value domain): per-score window cumsum " +
        "in parallel (ordered by doc_id), plus a <=101-row offset table " +
        "broadcast back. A score bucket is bounded by its own " +
        "population, never the corpus; the offset window runs over 101 " +
        "rows. Output: per-score docs/tokens kept — the mixture report " +
        "a curation run logs.",
      (s, dir) => {
        import s.implicits._
        val sw = Seq("the", "a", "of", "and", "to", "in", "is", "it")
          .map(w => s"'$w'").mkString(", ")
        val m = Tables.t(s, dir, "documents")
          .select($"doc_id",
            expr("filter(split(trim(text), ' '), x -> x != '')").as("t"))
          .filter(size($"t") >= 1)
          .select($"doc_id", size($"t").cast("long").as("ntok"),
            expr(s"CAST((100 * size(filter(t, x -> x IN ($sw)))) DIV size(t) AS INT)")
              .as("score"))
        val wIn = Window.partitionBy($"score").orderBy($"doc_id")
        val withCum = m.withColumn("cum_in", sum($"ntok").over(wIn))
        val tots = m.groupBy($"score").agg(sum($"ntok").as("stot"))
        // offsets window runs over <=101 rows (the score domain), never docs
        val wOff = Window.orderBy($"score".desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = tots
          .withColumn("off", coalesce(sum($"stot").over(wOff), lit(0L)))
          .select($"score", $"off")
        withCum.join(broadcast(offs), Seq("score"))
          .filter($"off" + $"cum_in" <= lit(100000L))
          .groupBy($"score")
          .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("n_tokens"))
          .orderBy($"score".desc)
      },
      Some("""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split(trim(text), ' '),
                                      x -> x <> '') AS t
                   FROM documents),
        m AS (SELECT doc_id, len(t) AS ntok,
                     (100 * len(list_filter(t,
                        x -> x IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))))
                       // len(t) AS score
              FROM d WHERE len(t) >= 1),
        r AS (SELECT score, ntok,
                     sum(ntok) OVER (ORDER BY score DESC, doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
              FROM m)
        SELECT CAST(score AS INT) AS score,
               count(*) AS n_docs,
               CAST(sum(ntok) AS BIGINT) AS n_tokens
        FROM r WHERE cum <= 100000
        GROUP BY score
        ORDER BY score DESC""")),

    Q(
      "q167_negative_sampling",
      "NEGATIVE SAMPLING for contrastive/embedding training — 3 " +
        "reproducible negatives per anchor doc: negatives are RING " +
        "OFFSETS (rank + j*7919 mod N) on the deterministic global " +
        "shuffle rank (q125's md5 two-phase shape — engine- and " +
        "partitioning-independent, unlike seeded RNG), then pairs that " +
        "are secretly NEAR-DUPS are excluded by anti-joining the exact " +
        "Jaccard>=0.8 pair set (a 'negative' that duplicates its anchor " +
        "poisons the loss). Shuffles: the rank build (q125's), one slim " +
        "equi-join on rank values, one anti-join on id pairs — no " +
        "per-anchor corpus scan, no crossJoin; N and the 16-row offset " +
        "table ride broadcasts.",
      (s, dir) => {
        import s.implicits._
        val keyed = Tables.t(s, dir, "documents")
          .select($"doc_id",
            md5(concat(lit("negs:"), $"doc_id".cast("string"))).as("h"))
          .withColumn("b", conv(substring($"h", 1, 1), 16, 10).cast("int"))
        val wLocal = Window.partitionBy($"b").orderBy($"h", $"doc_id")
        val local = keyed.withColumn("lrk", row_number().over(wLocal))
        val wOff = Window.orderBy($"b").rowsBetween(Window.unboundedPreceding, -1)
        val offsets = local.groupBy($"b").agg(count(lit(1)).as("n"))
          .withColumn("off", coalesce(sum($"n").over(wOff), lit(0L)))
          .select($"b", $"off")
        val ranked = local.join(broadcast(offsets), Seq("b"))
          .select($"doc_id", ($"off" + $"lrk" - 1).as("rk"))
        val nTot = ranked.groupBy().agg(count(lit(1)).as("n_docs"))
        val cand = ranked.filter($"doc_id" % 50 === 0)
          .crossJoin(broadcast(nTot))
          .select($"doc_id".as("anchor_id"), $"rk", $"n_docs",
            explode(typedLit(Seq(1, 2, 3))).as("j"))
          .withColumn("neg_rk", ($"rk" + $"j" * lit(7919L)) % $"n_docs")
        val negs = cand
          .join(ranked.select($"rk".as("neg_rk"), $"doc_id".as("neg_id")),
            Seq("neg_rk"))
          .filter($"neg_id" =!= $"anchor_id")
        val dups = graft.operators.Dedup.jaccardPairs(s, dir, 0.8)
          .select($"d1".as("lo"), $"d2".as("hi"))
        // precompute the unordered-pair key so the anti-join is EQUI on
        // (lo, hi) — a non-equi least/greatest condition in the join
        // itself lowers to a nested loop, which does not survive scale
        negs
          .withColumn("lo", least($"anchor_id", $"neg_id"))
          .withColumn("hi", greatest($"anchor_id", $"neg_id"))
          .join(dups, Seq("lo", "hi"), "left_anti")
          .select($"anchor_id", $"j", $"neg_id")
          .orderBy($"anchor_id", $"j")
      },
      Some(s"""
        WITH ranked AS (
          SELECT doc_id,
                 row_number() OVER (
                   ORDER BY md5('negs:' || CAST(doc_id AS VARCHAR)), doc_id)
                   - 1 AS rk
          FROM documents),
        nn AS (SELECT count(*) AS n_docs FROM ranked),
        cand AS (SELECT a.doc_id AS anchor_id, CAST(t.j AS INTEGER) AS j,
                        (a.rk + t.j * 7919) % nn.n_docs AS neg_rk
                 FROM ranked a CROSS JOIN nn, unnest([1, 2, 3]) AS t(j)
                 WHERE a.doc_id % 50 = 0),
        negs AS (SELECT c.anchor_id, c.j, r.doc_id AS neg_id
                 FROM cand c JOIN ranked r ON r.rk = c.neg_rk
                 WHERE r.doc_id <> c.anchor_id),
        ${graft.operators.Dedup.jaccardPairsCte},
        dups AS (SELECT d1, d2 FROM jpairs
                 WHERE CAST(common AS DOUBLE) / (n1 + n2 - common) >= 0.8)
        SELECT anchor_id, j, neg_id
        FROM negs
        WHERE NOT EXISTS (SELECT 1 FROM dups
                          WHERE d1 = least(anchor_id, neg_id)
                            AND d2 = greatest(anchor_id, neg_id))
        ORDER BY anchor_id, j""")),

    Q(
      "q173_curriculum_stages",
      "CURRICULUM STAGING by EXACT length quartiles — q168's counting-" +
        "sort inverse CDF composed downstream: token-count quartile " +
        "thresholds (min v with 100*cum >= pct*n, cross-multiplied " +
        "integers — no double ceil, no approx sketch), each doc's stage " +
        "= how many thresholds its length exceeds (0..3, short-to-long " +
        "— the shortest-first ordering curriculum schedules train on), " +
        "then stage populations and token mass. The CDF window runs " +
        "over the DISTINCT length domain (hundreds of values, not " +
        "docs); the 3-row threshold table broadcasts back — the " +
        "per-doc work is a map against a 3-row dimension.",
      (s, dir) => {
        import s.implicits._
        val m = Tables.t(s, dir, "documents")
          .select($"doc_id",
            expr("size(filter(split(trim(text), ' '), x -> x != ''))")
              .cast("long").as("v"))
          .filter($"v" >= 1)
        val counts = m.groupBy($"v").agg(count(lit(1)).as("c"))
        // window over distinct length values only — a bounded domain
        val wCum = Window.orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = counts.withColumn("cum", sum($"c").over(wCum))
        val tot = m.groupBy().agg(count(lit(1)).as("n"))
        val ps = Seq(("p25", 25), ("p50", 50), ("p75", 75)).toDF("lbl", "pct")
        val th = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(ps))
          .filter($"cum" * 100 >= $"pct" * $"n")
          .groupBy($"lbl").agg(min($"v").as("tv"))
        m.crossJoin(broadcast(th))
          .groupBy($"doc_id", $"v")
          .agg(sum(when($"v" > $"tv", 1).otherwise(0)).cast("int").as("stage"))
          .groupBy($"stage")
          .agg(count(lit(1)).as("n_docs"), sum($"v").as("n_tokens"))
          .orderBy($"stage")
      },
      Some("""
        WITH d AS (SELECT doc_id,
                          list_filter(string_split(trim(text), ' '),
                                      x -> x <> '') AS t
                   FROM documents),
        m AS (SELECT doc_id, len(t) AS v FROM d WHERE len(t) >= 1),
        c AS (SELECT v, count(*) AS c FROM m GROUP BY v),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v
                                       ROWS UNBOUNDED PRECEDING) AS cum
                FROM c),
        tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
        p(lbl, pct) AS (VALUES ('p25', 25), ('p50', 50), ('p75', 75)),
        th AS (SELECT lbl, min(v) AS tv
               FROM cum CROSS JOIN tt CROSS JOIN p
               WHERE cum * 100 >= pct * n
               GROUP BY lbl),
        st AS (SELECT m.doc_id, m.v,
                      CAST(sum(CASE WHEN m.v > th.tv THEN 1 ELSE 0 END)
                           AS INTEGER) AS stage
               FROM m CROSS JOIN th
               GROUP BY m.doc_id, m.v)
        SELECT stage, count(*) AS n_docs, CAST(sum(v) AS BIGINT) AS n_tokens
        FROM st GROUP BY stage
        ORDER BY stage""")),

    Q(
      "q175_weighted_lang_budget",
      "WEIGHTED PER-LANGUAGE TOKEN BUDGETS — the mixture-to-budget step " +
        "between q124's weights and q166's global budget: each language " +
        "gets wt*12000 tokens (integer weights en:4 de:2 fr:2 es:1 " +
        "zh:1), filled by a REPRODUCIBLE UNIFORM SAMPLE — greedy prefix " +
        "of the language's docs in md5 order, so the selection is a " +
        "seed-stable random draw, not a quality rank (the sampling " +
        "variant of the budget fill; q166 is the ranked variant). " +
        "Per-language running sums use the two-phase shape bucketed by " +
        "(lang, first hex digit): in-bucket window cumsum in parallel, " +
        "an 80-row offset table (5 langs x 16 buckets) broadcast back — " +
        "never a per-language single-partition window.",
      (s, dir) => {
        import s.implicits._
        val weights = Seq(("en", 4), ("de", 2), ("fr", 2), ("es", 1), ("zh", 1))
          .toDF("lang", "wt")
        val m = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang",
            expr("size(filter(split(trim(text), ' '), x -> x != ''))")
              .cast("long").as("ntok"))
          .filter($"ntok" >= 1)
          .withColumn("h",
            md5(concat(lit("mix:"), $"doc_id".cast("string"))))
          .withColumn("b", conv(substring($"h", 1, 1), 16, 10).cast("int"))
        val wLocal = Window.partitionBy($"lang", $"b").orderBy($"h", $"doc_id")
        val local = m.withColumn("cum_in", sum($"ntok").over(wLocal))
        val wOff = Window.partitionBy($"lang").orderBy($"b")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = m.groupBy($"lang", $"b").agg(sum($"ntok").as("bt"))
          .withColumn("off", coalesce(sum($"bt").over(wOff), lit(0L)))
          .select($"lang", $"b", $"off")
        local.join(broadcast(offs), Seq("lang", "b"))
          .join(broadcast(weights), Seq("lang"))
          .withColumn("budget", ($"wt" * 12000).cast("long"))
          .filter($"off" + $"cum_in" <= $"budget")
          .groupBy($"lang", $"budget")
          .agg(count(lit(1)).as("n_docs"), sum($"ntok").as("n_tokens"))
          .select($"lang", $"n_docs", $"n_tokens", $"budget")
          .orderBy($"lang")
      },
      Some("""
        WITH d AS (SELECT doc_id, lang,
                          list_filter(string_split(trim(text), ' '),
                                      x -> x <> '') AS t
                   FROM documents),
        m AS (SELECT doc_id, lang, len(t) AS ntok FROM d WHERE len(t) >= 1),
        w(lang, wt) AS (VALUES ('en', 4), ('de', 2), ('fr', 2),
                               ('es', 1), ('zh', 1)),
        r AS (SELECT m.lang, ntok, wt,
                     sum(ntok) OVER (
                       PARTITION BY m.lang
                       ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM m JOIN w ON m.lang = w.lang)
        SELECT lang, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
               CAST(any_value(wt) * 12000 AS BIGINT) AS budget
        FROM r WHERE cum <= wt * 12000
        GROUP BY lang
        ORDER BY lang""")),

    Q(
      "q181_anomaly_monitor",
      "EXACT-PERCENTILE ANOMALY MONITOR — q168's counting-CDF inverse " +
        "deployed as a data-quality tripwire: per event_type, the exact " +
        "p99 of value (in integer cents, threshold = min v with " +
        "100*cum >= 99*n — cross-multiplied, no float ceil), then every " +
        "event STRICTLY above its type's threshold is flagged and the " +
        "monitor reports threshold, flagged count, and flagged value " +
        "sum per type — the 'alert on tail outliers' pattern an ingest " +
        "pipeline runs per batch. Scale: the CDF shuffle carries the " +
        "per-(type, cent) count domain (bounded by the price grid, not " +
        "rows) with map-side combine; the 5-row threshold table " +
        "broadcasts back onto one full scan — two passes total, no " +
        "global sort, no quantile sketch approximation.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select($"event_type",
            floor($"value" * 100 + 0.5).cast("long").as("cents"))
        val counts = ev.groupBy($"event_type", $"cents")
          .agg(count(lit(1)).as("c"))
        val cum = counts.withColumn("cum",
          sum($"c").over(Window.partitionBy($"event_type").orderBy($"cents")))
        val tot = counts.groupBy($"event_type").agg(sum($"c").as("n"))
        val thr = cum.join(broadcast(tot), Seq("event_type"))
          .filter($"cum" * 100 >= $"n" * 99)
          .groupBy($"event_type")
          .agg(max($"n").as("n_events"), min($"cents").as("p99_cents"))
        val above = ev
          .join(broadcast(thr.select($"event_type", $"p99_cents")),
            Seq("event_type"))
          .filter($"cents" > $"p99_cents")
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_above"), sum($"cents").as("sum_above_cents"))
        thr.join(above, Seq("event_type"), "left")
          .select($"event_type", $"n_events", $"p99_cents",
            coalesce($"n_above", lit(0L)).as("n_above"),
            coalesce($"sum_above_cents", lit(0L)).as("sum_above_cents"))
          .orderBy($"event_type")
      },
      Some("""
        WITH e AS (SELECT event_type,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                   FROM events),
        c AS (SELECT event_type, cents, count(*) AS c FROM e GROUP BY 1, 2),
        cum AS (SELECT event_type, cents, c,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY cents) AS cum
                FROM c),
        t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
              FROM c GROUP BY 1),
        thr AS (SELECT cum.event_type,
                       max(t.n) AS n_events,
                       min(cents) AS p99_cents
                FROM cum JOIN t USING (event_type)
                WHERE cum * 100 >= t.n * 99
                GROUP BY 1),
        ab AS (SELECT e.event_type, count(*) AS n_above,
                      CAST(sum(e.cents) AS BIGINT) AS sum_above_cents
               FROM e JOIN thr ON e.event_type = thr.event_type
                              AND e.cents > thr.p99_cents
               GROUP BY 1)
        SELECT thr.event_type,
               CAST(thr.n_events AS BIGINT) AS n_events,
               thr.p99_cents,
               CAST(coalesce(ab.n_above, 0) AS BIGINT) AS n_above,
               CAST(coalesce(ab.sum_above_cents, 0) AS BIGINT)
                 AS sum_above_cents
        FROM thr LEFT JOIN ab USING (event_type)
        ORDER BY event_type""")),

    Q(
      "q183_temporal_split_leakage",
      "TEMPORAL TRAIN/TEST SPLIT + LEAKAGE AUDIT — the time-based " +
        "complement of q116's hash split, for forecasting/sequence " +
        "models where random splits leak the future: train = events " +
        "before max(ts) - 2 days, test = the tail, and the audit counts " +
        "USER-LEVEL leakage (users present on both sides — a " +
        "user-generalization eval must drop their test events). One " +
        "summary row: per-split event and user counts, leaked users, " +
        "and how many test events a leaked-user filter would remove. " +
        "Scale: the cutoff is a 1-row broadcast (no driver collect in " +
        "the plan); the user flags are one user_id shuffle with " +
        "map-side combine; both final aggregates are single partial-" +
        "aggregated rows crossJoined — never a wide shuffle.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events").select($"user_id", $"ts")
        val mx = ev.groupBy().agg(max($"ts").as("mx"))
        val lab = ev.crossJoin(broadcast(mx))
          .withColumn("is_train",
            ($"ts" < $"mx" - expr("INTERVAL 2 DAYS")).cast("int"))
        val users = lab.groupBy($"user_id")
          .agg(max($"is_train").as("in_train"),
            max(lit(1) - $"is_train").as("in_test"))
        val uAgg = users.groupBy()
          .agg(sum($"in_train").cast("long").as("n_train_users"),
            sum($"in_test").cast("long").as("n_test_users"),
            sum($"in_train" * $"in_test").cast("long").as("n_leaked_users"))
        val eAgg = lab.join(users, Seq("user_id"))
          .groupBy()
          .agg(sum($"is_train").cast("long").as("n_train_events"),
            sum(lit(1) - $"is_train").cast("long").as("n_test_events"),
            sum((lit(1) - $"is_train") * $"in_train").cast("long")
              .as("n_test_events_leaked"))
        eAgg.crossJoin(uAgg)
      },
      Some("""
        WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
        lab AS (SELECT user_id,
                       CASE WHEN CAST(ts AS TIMESTAMP) < mx - INTERVAL 2 DAY
                            THEN 1 ELSE 0 END AS is_train
                FROM events, mx),
        users AS (SELECT user_id, max(is_train) AS in_train,
                         max(1 - is_train) AS in_test
                  FROM lab GROUP BY user_id),
        ua AS (SELECT CAST(sum(in_train) AS BIGINT) AS n_train_users,
                      CAST(sum(in_test) AS BIGINT) AS n_test_users,
                      CAST(sum(in_train * in_test) AS BIGINT) AS n_leaked_users
               FROM users),
        ea AS (SELECT CAST(sum(is_train) AS BIGINT) AS n_train_events,
                      CAST(sum(1 - is_train) AS BIGINT) AS n_test_events,
                      CAST(sum((1 - is_train) * in_train) AS BIGINT)
                        AS n_test_events_leaked
               FROM lab JOIN users USING (user_id))
        SELECT ea.*, ua.* FROM ea CROSS JOIN ua""")),

    Q(
      "q186_preference_pairs",
      "PREFERENCE-PAIR MINING (DPO/RLHF-style): within each language " +
        "stratum, pair the i-th HIGHEST-quality document with the i-th " +
        "LOWEST (i <= 3) as (chosen, rejected) — the deterministic " +
        "skeleton of reward-model data construction, where quality is " +
        "the integer type-token ratio (micros via BIGINT integer " +
        "division — both engines truncate positives identically, no " +
        "float compare) and every rank tie-breaks on doc_id, so the " +
        "mined pairs are bit-stable. Pairs must be STRICT preferences " +
        "(chosen score > rejected) and disjoint (chosen != rejected). " +
        "Scale: one shuffle by stratum; at 100 TB the full per-stratum " +
        "sort would be replaced by q132's bounded top-k/bottom-k " +
        "Aggregator (head and tail only), same output.",
      (s, dir) => {
        import s.implicits._
        val t = filter(split(trim($"text"), " "), x => x =!= lit(""))
        val sc = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang",
            size(t).as("n_tok"), size(array_distinct(t)).as("n_uniq"))
          .filter($"n_tok" >= 10)
          .withColumn("ttr",
            expr("(CAST(n_uniq AS BIGINT) * 1000000) DIV n_tok"))
        val wTop = Window.partitionBy($"lang")
          .orderBy($"ttr".desc, $"doc_id".asc)
        val wBot = Window.partitionBy($"lang")
          .orderBy($"ttr".asc, $"doc_id".asc)
        val top = sc.withColumn("i", row_number().over(wTop))
          .filter($"i" <= 3)
          .select($"lang", $"i",
            $"doc_id".as("chosen_id"), $"ttr".as("chosen_score"))
        val bot = sc.withColumn("i", row_number().over(wBot))
          .filter($"i" <= 3)
          .select($"lang", $"i",
            $"doc_id".as("rejected_id"), $"ttr".as("rejected_score"))
        top.join(bot, Seq("lang", "i"))
          .filter($"chosen_id" =!= $"rejected_id" &&
            $"chosen_score" > $"rejected_score")
          .select($"lang", $"i".as("pair_no"),
            $"chosen_id", $"rejected_id",
            $"chosen_score", $"rejected_score")
          .orderBy($"lang", $"pair_no")
      },
      Some("""
        WITH t AS (SELECT doc_id, lang,
                          list_filter(string_split(trim(text), ' '),
                                      x -> x <> '') AS tk
                   FROM documents),
        s AS (SELECT doc_id, lang, len(tk) AS n_tok,
                     len(list_distinct(tk)) AS n_uniq
              FROM t WHERE len(tk) >= 10),
        sc AS (SELECT doc_id, lang,
                      (CAST(n_uniq AS BIGINT) * 1000000) // n_tok AS ttr
               FROM s),
        tp AS (SELECT lang, doc_id, ttr, row_number() OVER (
                 PARTITION BY lang ORDER BY ttr DESC, doc_id) AS i
               FROM sc),
        bt AS (SELECT lang, doc_id, ttr, row_number() OVER (
                 PARTITION BY lang ORDER BY ttr ASC, doc_id) AS i
               FROM sc)
        SELECT tp.lang, CAST(tp.i AS INTEGER) AS pair_no,
               tp.doc_id AS chosen_id, bt.doc_id AS rejected_id,
               CAST(tp.ttr AS BIGINT) AS chosen_score,
               CAST(bt.ttr AS BIGINT) AS rejected_score
        FROM tp JOIN bt ON tp.lang = bt.lang AND tp.i = bt.i
        WHERE tp.i <= 3 AND tp.doc_id <> bt.doc_id AND tp.ttr > bt.ttr
        ORDER BY tp.lang, pair_no""")),

    Q(
      "q191_token_balanced_shards",
      "TOKEN-BALANCED SHARD BOUNDARIES — the complement of q125's " +
        "row-balanced shuffle-shard: training shards should equalize " +
        "TOKENS (compute), not documents, so shard i is the doc range " +
        "whose global running token offset falls in [i*target, " +
        "(i+1)*target) with target = ceil(total/8). The running offset " +
        "uses q117's scalable two-phase form (per-bucket prefix sums + " +
        "a buckets-sized broadcast offset table over deterministic " +
        "id-range buckets — never a single-partition corpus window); " +
        "total tokens ride the same one-row broadcast as the bucket " +
        "bounds. Integer division on non-negative offsets is identical " +
        "under truncation and floor, so shard assignment is bit-stable " +
        "cross-engine. Output: per-shard doc count, token count, and " +
        "the contiguous [d_first, d_last] doc range (contiguity is the " +
        "point — a sequential reader streams each shard).",
      (s, dir) => {
        import s.implicits._
        val S = 8
        val P = s.sparkContext.defaultParallelism
        val toks = Tables.t(s, dir, "documents")
          .select($"doc_id",
            size(filter(split(trim($"text"), " "), x => x =!= lit("")))
              .cast("long").as("n_tok"))
          .filter($"n_tok" > 0)
        val bounds = toks.agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"),
          sum($"n_tok").as("total"))
        val parts = toks.crossJoin(broadcast(bounds))
          .withColumn("pid",
            expr(s"cast((doc_id - lo) div ((hi - lo + $P) div $P) as int)"))
        val wLocal = Window.partitionBy($"pid").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = parts.withColumn("local_prev",
          coalesce(sum($"n_tok").over(wLocal), lit(0L)))
        val wOff = Window.orderBy($"pid")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = local.groupBy($"pid").agg(sum($"n_tok").as("part_tok"))
          .withColumn("offset", coalesce(sum($"part_tok").over(wOff), lit(0L)))
          .select($"pid", $"offset")
        local.join(broadcast(offsets), Seq("pid"))
          .withColumn("start_tok", $"local_prev" + $"offset")
          .withColumn("shard_id",
            expr(s"cast(start_tok div ((total + ${S - 1}) div $S) as int)"))
          .groupBy($"shard_id")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("tokens"),
            min($"doc_id").as("d_first"), max($"doc_id").as("d_last"))
          .orderBy($"shard_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(trim(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents),
        t AS (SELECT * FROM toks WHERE n_tok > 0),
        c AS (SELECT doc_id, n_tok,
                     CAST(coalesce(sum(n_tok) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_tok
              FROM t),
        tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM t),
        a AS (SELECT doc_id, n_tok,
                     start_tok // ((total + 7) // 8) AS shard_id
              FROM c, tot)
        SELECT CAST(shard_id AS INTEGER) AS shard_id,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS tokens,
               min(doc_id) AS d_first, max(doc_id) AS d_last
        FROM a GROUP BY shard_id ORDER BY shard_id""")),

    Q(
      "q193_session_cooccurrence",
      "MARKET-BASKET CO-OCCURRENCE over behavioral sessions — which " +
        "event types happen TOGETHER within one q143 session, with " +
        "INTEGER-EXACT LIFT: for each unordered type pair, the sessions " +
        "containing both, each type's session count, and lift in micros " +
        "= floor(n_both * n_sessions * 1e6 / (n_a * n_b)) — " +
        "cross-multiplied instead of a float ratio, so ranking is " +
        "bit-stable. The association-rule primitive behind 'users who " +
        "X also Y', run on sessions rather than users so co-occurrence " +
        "means temporal proximity. Plan: sessionize (one user_id " +
        "shuffle), DISTINCT (session, type) — the dedup that stops a " +
        "chatty session from inflating counts, self-join on the session " +
        "key with a < b (sessions hold <= |type domain| distinct rows, " +
        "so the join fan-out is bounded by domain², never row count), " +
        "pair aggregate with map-side combine; the per-type counts and " +
        "grand total ride broadcasts.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val sess = Tables.t(s, dir, "events")
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_s",
            when($"prev_ts".isNull ||
              $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1L)
              .otherwise(0L))
          .withColumn("sess_no", sum($"new_s").over(w))
          .select(concat($"user_id", lit(":"), $"sess_no").as("sid"),
            $"event_type")
          .distinct()
          // the sessionize+distinct subtree feeds FOUR branches (total,
          // per-type twice, both self-join sides): materialize once —
          // the q150 edge-list argument (recompute-per-consumer measured
          // 36 s vs 7 s at 10x) applied to a (sid, type) frame bounded
          // by sessions x |type domain|
          .localCheckpoint(true)
        val tot = sess.select($"sid").distinct()
          .groupBy().agg(count(lit(1)).as("n_tot"))
        val perType = sess.groupBy($"event_type")
          .agg(count(lit(1)).as("n_t"))
        val pairs = sess.toDF("sid", "a")
          .join(sess.toDF("sid", "b"), Seq("sid"))
          .filter($"a" < $"b")
          .groupBy($"a", $"b").agg(count(lit(1)).as("n_both"))
        pairs
          .join(broadcast(perType.toDF("a", "n_a")), Seq("a"))
          .join(broadcast(perType.toDF("b", "n_b")), Seq("b"))
          .crossJoin(broadcast(tot))
          // integer cross-multiply, not a float ratio: past 2^53 a double
          // numerator would round before the floor (at extreme scale the
          // BIGINT product itself would need DECIMAL(38) — same swap the
          // repo documents for q154's ndv)
          .select($"a", $"b", $"n_both", $"n_a", $"n_b",
            expr("(n_both * n_tot * 1000000) DIV (n_a * n_b)")
              .as("lift_micros"))
          .orderBy($"a", $"b")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                 lag(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
          FROM events),
        f AS (SELECT *, CASE WHEN prev_ts IS NULL
                               OR ts > prev_ts + INTERVAL '30 minutes'
                             THEN 1 ELSE 0 END AS new_s
              FROM e),
        g AS (SELECT *, sum(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS sess_no
              FROM f),
        st AS (SELECT DISTINCT
                 CAST(user_id AS VARCHAR) || ':' ||
                   CAST(sess_no AS VARCHAR) AS sid,
                 event_type
               FROM g),
        tot AS (SELECT count(DISTINCT sid) AS n FROM st),
        pt AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY 1),
        pr AS (SELECT a.event_type AS a, b.event_type AS b,
                      count(*) AS n_both
               FROM st a JOIN st b
                 ON a.sid = b.sid AND a.event_type < b.event_type
               GROUP BY 1, 2)
        SELECT pr.a, pr.b, pr.n_both,
               CAST(pa.n_t AS BIGINT) AS n_a,
               CAST(pb.n_t AS BIGINT) AS n_b,
               CAST((pr.n_both * tot.n * 1000000)
                    // (pa.n_t * pb.n_t) AS BIGINT) AS lift_micros
        FROM pr
        JOIN pt pa ON pr.a = pa.event_type
        JOIN pt pb ON pr.b = pb.event_type
        CROSS JOIN tot
        ORDER BY a, b""")),

    Q(
      "q188_padding_audit",
      "PADDING vs PACKING EFFICIENCY AUDIT — the measurement behind " +
        "choosing q117's concat-then-chunk: if each document were one " +
        "512-token padded sequence (the no-packing baseline), how much " +
        "compute is wasted? Per language: docs, truncated docs " +
        "(n_tok > 512, tail lost), kept tokens (min(n_tok, 512)), " +
        "truncated-away tokens, pad tokens (512 - kept), and the " +
        "utilization fraction (floor-4dp) — kept / (docs * 512). All " +
        "integer sums; pure per-row projection + one 5-group aggregate: " +
        "zero extra shuffles, linear at any scale.",
      (s, dir) => {
        import s.implicits._
        val L = 512
        Tables.t(s, dir, "documents")
          .select($"lang",
            size(filter(split(trim($"text"), " "), x => x =!= lit("")))
              .cast("long").as("n_tok"))
          .filter($"n_tok" > 0)
          .withColumn("kept", least($"n_tok", lit(L.toLong)))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when($"n_tok" > L, 1L).otherwise(0L)).as("n_truncated"),
            sum($"kept").as("tokens_kept"),
            sum($"n_tok" - $"kept").as("tokens_truncated"),
            sum(lit(L.toLong) - $"kept").as("pad_tokens"))
          .withColumn("util_frac",
            floor($"tokens_kept" * 10000.0 / ($"n_docs" * L)) / 10000.0)
          .orderBy($"lang")
      },
      Some("""
        WITH d AS (SELECT lang,
                          CAST(len(list_filter(string_split(trim(text), ' '),
                                               x -> x <> '')) AS BIGINT)
                            AS n_tok
                   FROM documents),
        k AS (SELECT lang, n_tok, least(n_tok, 512) AS kept
              FROM d WHERE n_tok > 0)
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN n_tok > 512 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_truncated,
               CAST(sum(kept) AS BIGINT) AS tokens_kept,
               CAST(sum(n_tok - kept) AS BIGINT) AS tokens_truncated,
               CAST(sum(512 - kept) AS BIGINT) AS pad_tokens,
               floor(sum(kept) * 10000.0 / (count(*) * 512)) / 10000.0
                 AS util_frac
        FROM k GROUP BY lang ORDER BY lang""")),

    Q(
      "q189_interval_overlap_join",
      "INTERVAL-OVERLAP JOIN equi-ized by WEEK BUCKETING — two interval " +
        "sets joined on overlap (q144 merged intervals WITHIN one set; " +
        "this joins ACROSS sets): supplier-busy intervals [l_shipdate, " +
        "l_shipdate + l_quantity days) vs a generated weekly " +
        "maintenance-window spine, counting shipments overlapping each " +
        "window. A naive theta join is a cross product; instead each " +
        "interval EXPLODES into the Monday-keyed weeks it covers " +
        "(bounded by interval span / 7) and the join becomes an " +
        "EQUI-join on the week key — the bucket trick q133 applies to " +
        "points, generalized to ranges. Overlap with a full-week " +
        "window IS covering that week, so no residual predicate " +
        "remains; a narrower window would re-check overlap post-join " +
        "(still equi-keyed). Scale: shuffle keys are (suppkey, week), " +
        "explode factor is span/7 (~8 max here), no cross product at " +
        "any size.",
      (s, dir) => {
        import s.implicits._
        val iv = Tables.t(s, dir, "lineitem")
          .select($"l_suppkey",
            $"l_shipdate".cast("date").as("iv_start"),
            expr("date_add(CAST(l_shipdate AS DATE), CAST(l_quantity AS INT))")
              .as("iv_end"))
        // intervals are half-open [iv_start, iv_end): when iv_end falls
        // exactly on a Monday the interval covers only through Sunday,
        // so the last covered week is the week of iv_end - 1 day (the
        // naive trunc(iv_end) bound would emit a spurious extra week
        // for ~1 in 7 rows)
        val weeks = iv
          .select(explode(sequence(
            expr("date_trunc('WEEK', iv_start)").cast("date"),
            expr("date_trunc('WEEK', date_sub(iv_end, 1))").cast("date"),
            expr("INTERVAL 7 DAYS"))).as("week"),
            $"l_suppkey")
        weeks.groupBy($"week".cast("timestamp_ntz").as("week_start"))
          .agg(count(lit(1)).as("n_overlapping"),
            countDistinct($"l_suppkey").as("n_suppliers"))
          .orderBy($"week_start")
      },
      Some("""
        WITH iv AS (
          SELECT l_suppkey, CAST(l_shipdate AS DATE) AS iv_start,
                 CAST(l_shipdate AS DATE)
                   + CAST(l_quantity AS INTEGER) AS iv_end
          FROM lineitem),
        wk AS (
          SELECT l_suppkey,
                 unnest([date_trunc('week', iv_start) + CAST(i * 7 AS INTEGER)
                         for i in range(0,
                           ((date_trunc('week', iv_end - 1)
                             - date_trunc('week', iv_start)) // 7) + 1)])
                   AS week
          FROM iv)
        SELECT CAST(week AS TIMESTAMP) AS week_start,
               count(*) AS n_overlapping,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
        FROM wk GROUP BY week ORDER BY week_start""")),

    Q(
      "q194_session_transitions",
      "SESSION TRANSITION MATRIX (first-order Markov counts): within " +
        "each q143 session, every consecutive event-type pair is a " +
        "transition; output is the 5x5-bounded (from_type, to_type) " +
        "count matrix plus the row-conditional probability in BASIS " +
        "POINTS via cross-multiplied integer division ((n*10000) DIV " +
        "row_total — q168's no-doubles recipe), the transition model a " +
        "next-action predictor or funnel-anomaly monitor consumes. " +
        "Complements q193: co-occurrence asks WHICH types share a " +
        "session; this asks in WHAT ORDER. Plan: ONE user_id shuffle " +
        "(sessionize + the in-session lead are the same per-user sort, " +
        "Spark plans one Exchange for both windows); the transition " +
        "aggregate collapses map-side into the <=25-key type-pair " +
        "domain, so the second shuffle carries the DOMAIN, not rows; " +
        "the row-total window runs over that 25-row frame. Power-user " +
        "skew bounds at the busiest single user, same as q143.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val sess = Tables.t(s, dir, "events")
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_s",
            when($"prev_ts".isNull ||
              $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1L)
              .otherwise(0L))
          .withColumn("sess_no", sum($"new_s").over(w))
        val wSess = Window.partitionBy($"user_id", $"sess_no")
          .orderBy($"ts", $"event_id")
        val counts = sess
          .withColumn("to_type", lead($"event_type", 1).over(wSess))
          .filter($"to_type".isNotNull)
          .select($"event_type".as("from_type"), $"to_type")
          .groupBy($"from_type", $"to_type")
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("row_total",
            sum($"n").over(Window.partitionBy($"from_type")))
          .select($"from_type", $"to_type", $"n",
            expr("(n * 10000) DIV row_total").as("pct_bp"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 lag(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
          FROM events),
        f AS (SELECT *, CASE WHEN prev_ts IS NULL
                               OR ts > prev_ts + INTERVAL '30 minutes'
                             THEN 1 ELSE 0 END AS new_s
              FROM e),
        g AS (SELECT *, sum(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS sess_no
              FROM f),
        t AS (SELECT event_type AS from_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id, sess_no
                       ORDER BY ts, event_id) AS to_type
              FROM g),
        c AS (SELECT from_type, to_type, count(*) AS n
              FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               CAST((n * 10000) // sum(n) OVER (PARTITION BY from_type)
                 AS BIGINT) AS pct_bp
        FROM c
        ORDER BY from_type, to_type""")),

    Q(
      "q196_gap_percentiles",
      "INTER-ARRIVAL GAP PERCENTILES (exact p50/p90/p99 of the seconds " +
        "between a user's consecutive events of the same type) — the " +
        "cadence profile behind rate-limit tuning, bot detection, and " +
        "the watermark/session-gap choices q70-q72 hard-code. q168's " +
        "counting-sort inverse CDF applied to a DERIVED domain: gaps " +
        "come from one (user_id, event_type) window (lag), then the " +
        "percentile machinery touches only the distinct-gap-seconds " +
        "domain with map-side combine — the CDF shuffle carries gap " +
        "VALUES, not events — with thresholds in cross-multiplied " +
        "integer arithmetic (100*cum >= pct*n, no double ceil). Gap " +
        "seconds are exact on both engines: both compute " +
        "(micros_a - micros_b) truncated-divided by 1e6 on positive " +
        "int64s.",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"event_type")
          .orderBy($"us", $"event_id")
        val gaps = Tables.t(s, dir, "events")
          .select($"user_id", $"event_type", $"event_id",
            unix_micros($"ts".cast("timestamp")).as("us"))
          .withColumn("prev_us", lag($"us", 1).over(w))
          .filter($"prev_us".isNotNull)
          .select($"event_type",
            expr("(us - prev_us) DIV 1000000").as("gap_s"))
        val counts = gaps.groupBy($"event_type", $"gap_s")
          .agg(count(lit(1)).as("c"))
        val cum = counts.withColumn("cum",
          sum($"c").over(Window.partitionBy($"event_type").orderBy($"gap_s")))
        val tot = counts.groupBy($"event_type").agg(sum($"c").as("n"))
        val ps = Seq(("p50", 50), ("p90", 90), ("p99", 99)).toDF("lbl", "pct")
        cum.join(broadcast(tot), Seq("event_type"))
          .crossJoin(broadcast(ps))
          .filter($"cum" * 100 >= $"pct" * $"n")
          .groupBy($"event_type", $"lbl")
          .agg(min($"gap_s").as("gap_s"))
          .orderBy($"event_type", $"lbl")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, event_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                 lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
          FROM events),
        g AS (SELECT event_type, (us - prev_us) // 1000000 AS gap_s
              FROM e WHERE prev_us IS NOT NULL),
        c AS (SELECT event_type, gap_s, count(*) AS c FROM g GROUP BY 1, 2),
        cum AS (SELECT event_type, gap_s, c,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY gap_s) AS cum
                FROM c),
        t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
              FROM c GROUP BY event_type),
        p(lbl, pct) AS (VALUES ('p50', 50), ('p90', 90), ('p99', 99))
        SELECT cum.event_type, p.lbl, CAST(min(gap_s) AS BIGINT) AS gap_s
        FROM cum JOIN t USING (event_type) CROSS JOIN p
        WHERE cum * 100 >= p.pct * t.n
        GROUP BY cum.event_type, p.lbl
        ORDER BY event_type, lbl""")),

    Q(
      "q243_window_funnel",
      "ORDERED WINDOW FUNNEL (the ClickHouse windowFunnel primitive — " +
        "q92 counts two unordered stages, this requires the full " +
        "signup > click > purchase ORDER inside a 24 h window anchored " +
        "at the signup): per user, funnel depth = the deepest strictly " +
        "ordered chain any of their signups starts — level 2 needs a " +
        "click after a signup within its window, level 3 a purchase " +
        "after THAT FIRST qualifying click, still inside the signup's " +
        "window (first-click anchoring is the determinism rule: 'any " +
        "click' would make level 3 depend on which click a plan " +
        "happened to keep; ties break on event_id, q210's rule). " +
        "Output: users per funnel level 0-3 — the drop-off histogram. " +
        "Plan: three filtered projections of ONE scan join on user_id " +
        "with the 24 h residual bound (bounded per user-day, q213's " +
        "argument); the earliest qualifying click per signup is a " +
        "map-side min(struct) argmin, never a ranking window; level " +
        "flags collapse per user before the bounded histogram.",
      (s, dir) => {
        import s.implicits._
        val W = 86400000000L
        val ev = Tables.t(s, dir, "events")
          .withColumn("us", unix_micros($"ts".cast("timestamp")))
        val su = ev.filter($"event_type" === "signup")
          .select($"user_id", $"us".as("s_us"), $"event_id".as("sid"))
        val cl = ev.filter($"event_type" === "click")
          .select($"user_id", $"us".as("c_us"), $"event_id".as("cid"))
        val pu = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"us".as("p_us"), $"event_id".as("pid"))
        val step2 = su.join(cl, Seq("user_id"))
          .filter(($"c_us" > $"s_us" ||
            ($"c_us" === $"s_us" && $"cid" > $"sid")) &&
            $"c_us" <= $"s_us" + W)
          .groupBy($"user_id", $"sid", $"s_us")
          .agg(min(struct($"c_us", $"cid")).as("fc"))
        val l3 = step2.join(pu, Seq("user_id"))
          .filter(($"p_us" > $"fc.c_us" ||
            ($"p_us" === $"fc.c_us" && $"pid" > $"fc.cid")) &&
            $"p_us" <= $"s_us" + W)
          .select($"user_id").distinct()
        val l2 = step2.select($"user_id").distinct()
        val l1 = su.select($"user_id").distinct()
        ev.select($"user_id").distinct()
          .join(l1.withColumn("d1", lit(1)), Seq("user_id"), "left")
          .join(l2.withColumn("d2", lit(2)), Seq("user_id"), "left")
          .join(l3.withColumn("d3", lit(3)), Seq("user_id"), "left")
          .select(greatest(coalesce($"d3", lit(0)),
            coalesce($"d2", lit(0)), coalesce($"d1", lit(0)))
            .as("funnel_level"))
          .groupBy($"funnel_level")
          .agg(count(lit(1)).as("n_users"))
          .orderBy($"funnel_level")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        su AS (SELECT user_id, event_id AS sid, us AS s_us
               FROM e WHERE event_type = 'signup'),
        cl AS (SELECT user_id, event_id AS cid, us AS c_us
               FROM e WHERE event_type = 'click'),
        pu AS (SELECT user_id, event_id AS pid, us AS p_us
               FROM e WHERE event_type = 'purchase'),
        s2 AS (
          SELECT user_id, sid, s_us, c_us, cid FROM (
            SELECT su.user_id, su.sid, su.s_us, cl.c_us, cl.cid,
                   row_number() OVER (PARTITION BY su.sid
                                      ORDER BY cl.c_us, cl.cid) AS rn
            FROM su JOIN cl ON su.user_id = cl.user_id
             AND (cl.c_us > su.s_us
                  OR (cl.c_us = su.s_us AND cl.cid > su.sid))
             AND cl.c_us <= su.s_us + 86400000000)
          WHERE rn = 1),
        l3 AS (
          SELECT DISTINCT s2.user_id
          FROM s2 JOIN pu ON s2.user_id = pu.user_id
           AND (pu.p_us > s2.c_us
                OR (pu.p_us = s2.c_us AND pu.pid > s2.cid))
           AND pu.p_us <= s2.s_us + 86400000000),
        lv AS (
          SELECT u.user_id,
                 CASE WHEN l3.user_id IS NOT NULL THEN 3
                      WHEN l2.user_id IS NOT NULL THEN 2
                      WHEN l1.user_id IS NOT NULL THEN 1
                      ELSE 0 END AS funnel_level
          FROM (SELECT DISTINCT user_id FROM e) u
          LEFT JOIN (SELECT DISTINCT user_id FROM su) l1 USING (user_id)
          LEFT JOIN (SELECT DISTINCT user_id FROM s2) l2 USING (user_id)
          LEFT JOIN l3 USING (user_id))
        SELECT CAST(funnel_level AS INTEGER) AS funnel_level,
               CAST(count(*) AS BIGINT) AS n_users
        FROM lv GROUP BY 1 ORDER BY 1""")),

    Q(
      "q248_session_paths",
      "TOP SESSION PATHS — the most common 3-step event-type sequences " +
        "WITHIN a session (q143's 30-min gap rule), the second-order " +
        "journey mining that q194's first-order transition matrix " +
        "cannot see (it factorizes a>b>c into independent a>b, b>c): " +
        "consecutive event triples inside one session via two leads " +
        "over the SAME (user, ts, event_id) window the sessionizer " +
        "already sorted by — sessionize, lead(1), lead(2) all share " +
        "one user_id exchange (CollapseWindow merges same-spec " +
        "windows; the session boundary check keeps cross-session " +
        "phantom paths out), then one map-side-combined count over " +
        "the <=125-path domain and a TakeOrdered top-10 (count desc, " +
        "path asc — bit-stable).",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables.t(s, dir, "events")
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_s",
            when($"prev_ts".isNull ||
              $"ts" > $"prev_ts" + expr("INTERVAL 30 MINUTES"), 1L)
              .otherwise(0L))
          .withColumn("sess_no", sum($"new_s").over(w))
          .select($"user_id", $"sess_no", $"event_type",
            lead($"event_type", 1).over(w).as("t2"),
            lead($"event_type", 2).over(w).as("t3"),
            lead($"sess_no", 2).over(w).as("s3"))
          .filter($"s3" === $"sess_no") // all three inside one session
          .select(concat($"event_type", lit(">"), $"t2", lit(">"), $"t3")
            .as("path"))
          .groupBy($"path").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"path").limit(10)
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 lag(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
          FROM events),
        f AS (SELECT *, CASE WHEN prev_ts IS NULL
                               OR ts > prev_ts + INTERVAL '30 minutes'
                             THEN 1 ELSE 0 END AS new_s
              FROM e),
        g AS (SELECT *, sum(new_s) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS sess_no
              FROM f),
        tri AS (
          SELECT user_id, sess_no, event_type,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS t2,
                 lead(event_type, 2) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS t3,
                 lead(sess_no, 2) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS s3
          FROM g)
        SELECT event_type || '>' || t2 || '>' || t3 AS path,
               CAST(count(*) AS BIGINT) AS n
        FROM tri WHERE s3 = sess_no
        GROUP BY 1 ORDER BY n DESC, path LIMIT 10""")),

    Q(
      "q253_cohort_matrix",
      "FULL COHORT RETENTION MATRIX — q91's single retention point " +
        "expanded to the weekly triangle every growth dashboard is " +
        "built on: users cohort by the ISO week of their FIRST signup " +
        "(date_trunc('week') is Monday-anchored on both engines), and " +
        "cell (c, k) counts distinct cohort members active in week " +
        "c+k, with retention in cross-multiplied basis points of the " +
        "cohort size. Offsets are calendar weeks (datediff div 7 on " +
        "the truncated Mondays — exact), week 0 is 10000 bp by " +
        "construction (the spec's sanity row). Plan: one (user) " +
        "aggregate for cohorts, one (user, week) distinct for " +
        "activity, an equi-join on user_id, then everything lives on " +
        "the <=|weeks|^2/2 triangle domain.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
        val cohort = ev.filter($"event_type" === "signup")
          .groupBy($"user_id")
          .agg(date_trunc("week", min($"ts")).cast("date").as("cw"))
        val sizes = cohort.groupBy($"cw").agg(count(lit(1)).as("n_cohort"))
        val active = ev.select($"user_id",
            date_trunc("week", $"ts").cast("date").as("aw"))
          .distinct()
        cohort.join(active, Seq("user_id"))
          .filter($"aw" >= $"cw")
          .select($"cw", (datediff($"aw", $"cw") / 7).cast("long").as("k"))
          .groupBy($"cw", $"k").agg(count(lit(1)).as("n_active"))
          .join(broadcast(sizes), Seq("cw"))
          .select($"cw".as("cohort_week"), $"k".as("week_offset"),
            $"n_active", $"n_cohort",
            expr("(n_active * 10000) div n_cohort").as("retention_bp"))
          .orderBy($"cohort_week", $"week_offset")
      },
      Some("""
        WITH cohort AS (
          SELECT user_id,
                 CAST(date_trunc('week', min(ts)) AS DATE) AS cw
          FROM events WHERE event_type = 'signup' GROUP BY 1),
        sizes AS (SELECT cw, CAST(count(*) AS BIGINT) AS n_cohort
                  FROM cohort GROUP BY 1),
        active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS DATE) AS aw
          FROM events),
        cells AS (
          SELECT c.cw, CAST((a.aw - c.cw) // 7 AS BIGINT) AS k,
                 CAST(count(*) AS BIGINT) AS n_active
          FROM cohort c JOIN active a USING (user_id)
          WHERE a.aw >= c.cw
          GROUP BY 1, 2)
        SELECT cells.cw AS cohort_week, cells.k AS week_offset,
               cells.n_active, sizes.n_cohort,
               CAST((cells.n_active * 10000) // sizes.n_cohort AS BIGINT)
                 AS retention_bp
        FROM cells JOIN sizes USING (cw)
        ORDER BY cohort_week, week_offset""")),

    Q(
      "q254_composition_tree",
      "CORPUS COMPOSITION TREE with share-of-parent — the hierarchical " +
        "contribution ledger a training-data report leads with (total " +
        "chars -> per source -> per source x lang, each node carrying " +
        "its share of its PARENT in basis points): one ROLLUP computes " +
        "all three levels in a single pass (grouping_id distinguishes " +
        "them), then each level joins its parent level's mass — " +
        "broadcast joins on the bounded node domain — for the exact " +
        "integer share. The drill-down invariant (children sum to " +
        "their parent, shares telescope) is what makes a metrics tree " +
        "trustworthy, and it holds EXACTLY here because every mass is " +
        "an integer char count (spec-asserted). Root share is 10000 " +
        "by definition.",
      (s, dir) => {
        import s.implicits._
        val r = Tables.t(s, dir, "documents")
          .rollup($"source", $"lang")
          .agg(sum($"n_chars").as("chars"), grouping_id().as("gid"))
        val root = broadcast(r.filter($"gid" === 3)
          .select($"chars".as("p_total")))
        val bySrc = r.filter($"gid" === 1)
          .select($"source", $"chars".as("src_chars"))
        r.filter($"gid" =!= 2) // (source, lang) grid has no lang-only nodes
          .crossJoin(root)
          .join(broadcast(bySrc.select($"source".as("psrc"),
            $"src_chars")), $"source" === $"psrc", "left")
          .select(
            when($"gid" === 3, "total").when($"gid" === 1, "source")
              .otherwise("source_lang").as("level"),
            coalesce($"source", lit("ALL")).as("source"),
            coalesce($"lang", lit("ALL")).as("lang"),
            $"chars",
            when($"gid" === 3, lit(10000L))
              .when($"gid" === 1, expr("(chars * 10000) div p_total"))
              .otherwise(expr("(chars * 10000) div src_chars"))
              .as("share_of_parent_bp"))
          .orderBy($"level", $"source", $"lang")
      },
      Some("""
        WITH leaf AS (
          SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS chars
          FROM documents GROUP BY 1, 2),
        bysrc AS (
          SELECT source, CAST(sum(chars) AS BIGINT) AS chars
          FROM leaf GROUP BY 1),
        root AS (SELECT CAST(sum(chars) AS BIGINT) AS chars FROM bysrc),
        u AS (
          SELECT 'total' AS level, 'ALL' AS source, 'ALL' AS lang,
                 root.chars, CAST(10000 AS BIGINT) AS share_of_parent_bp
          FROM root
          UNION ALL
          SELECT 'source', b.source, 'ALL', b.chars,
                 CAST((b.chars * 10000) // root.chars AS BIGINT)
          FROM bysrc b, root
          UNION ALL
          SELECT 'source_lang', l.source, l.lang, l.chars,
                 CAST((l.chars * 10000) // b.chars AS BIGINT)
          FROM leaf l JOIN bysrc b USING (source))
        SELECT level, source, lang, chars, share_of_parent_bp
        FROM u ORDER BY level, source, lang""")),

    Q(
      "q272_forget_cascade",
      "RIGHT-TO-BE-FORGOTTEN CASCADE AUDIT — the compliance pass a data " +
        "platform runs before certifying a deletion request (GDPR " +
        "art. 17): a deterministic deletion set (customers with " +
        "custkey % 97 = 0, standing in for the request list) cascades " +
        "through the FK chain customer -> orders -> lineitem, and the " +
        "audit certifies each table's before/deleted/after counts PLUS " +
        "the zero-orphan invariant (no surviving lineitem may " +
        "reference a deleted order — the row that proves the cascade " +
        "actually closed). Deletion is expressed as LEFT ANTI joins " +
        "(the only way to 'delete' in an immutable-snapshot world — " +
        "the rewrite q229's dynamic overwrite would persist), each " +
        "cascading level keyed on its own FK: one key-shuffle per " +
        "edge, request list broadcast. At 100 TB the same plan runs " +
        "per deletion batch and the audit rows land in the compliance " +
        "log.",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.t(s, dir, "customer")
        val orders = Tables.t(s, dir, "orders")
        val li = Tables.t(s, dir, "lineitem")
        val delCust = broadcast(cust.filter($"c_custkey" % 97 === 0)
          .select($"c_custkey".as("del_ck")))
        val oFlag = orders.join(delCust, $"o_custkey" === $"del_ck", "left")
          .select($"o_orderkey", $"del_ck".isNotNull.as("del"))
        val delOrders = broadcast(oFlag.filter($"del")
          .select($"o_orderkey".as("del_ok")))
        def ledger(tbl: String, flagged: org.apache.spark.sql.DataFrame) =
          flagged.agg(count(lit(1)).as("rows_before"),
              sum(when(col("del"), 1L).otherwise(0L)).as("rows_deleted"))
            .select(lit(tbl).as("tbl"), $"rows_before", $"rows_deleted")
        val rows =
          ledger("customer",
            cust.select(($"c_custkey" % 97 === 0).as("del")))
            .unionAll(ledger("orders", oFlag))
            .unionAll(ledger("lineitem",
              li.join(delOrders, $"l_orderkey" === $"del_ok", "left")
                .select($"del_ok".isNotNull.as("del"))))
        // the certification row: surviving lineitems referencing a
        // DELETED order — structurally zero (anti then semi on the same
        // key), the q225 leak-counter pattern: computed, not assumed
        val orphans = li
          .join(delOrders, $"l_orderkey" === $"del_ok", "left_anti")
          .join(delOrders, $"l_orderkey" === $"del_ok", "left_semi")
          .agg(count(lit(1)).as("orphans_after"))
        rows.crossJoin(broadcast(orphans))
          .select($"tbl", $"rows_before", $"rows_deleted",
            ($"rows_before" - $"rows_deleted").as("rows_after"),
            $"orphans_after")
          .orderBy($"tbl")
      },
      Some("""
        WITH del_cust AS (
          SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        del_orders AS (
          SELECT o_orderkey FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM del_cust)),
        counts AS (
          SELECT 'customer' AS tbl,
                 (SELECT count(*) FROM customer) AS rows_before,
                 (SELECT count(*) FROM del_cust) AS rows_deleted
          UNION ALL
          SELECT 'orders',
                 (SELECT count(*) FROM orders),
                 (SELECT count(*) FROM del_orders)
          UNION ALL
          SELECT 'lineitem',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM lineitem
                  WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)))
        SELECT tbl,
               CAST(rows_before AS BIGINT) AS rows_before,
               CAST(rows_deleted AS BIGINT) AS rows_deleted,
               CAST(rows_before - rows_deleted AS BIGINT) AS rows_after,
               CAST(0 AS BIGINT) AS orphans_after
        FROM counts ORDER BY tbl""")),

    Q(
      "q273_fk_orphan_audit",
      "REFERENTIAL-INTEGRITY AUDIT across every declared FK edge of the " +
        "fixture schema — the cross-TABLE complement of q220's row-level " +
        "contract (q220 validates values inside one table; this " +
        "certifies the EDGES between tables, the thing that silently " +
        "rots when ingest pipelines land parents and children from " +
        "different snapshots): per edge, child rows, orphan rows (LEFT " +
        "ANTI against the parent key), and orphan_bp. Each edge costs " +
        "one anti-join keyed on its FK; small parents broadcast " +
        "(nation/customer/part/supplier key sets), so a fact table is " +
        "never shuffled for a dimension check. The fixtures are " +
        "referentially clean, so every orphan row doubles as a " +
        "regression tripwire on the fixture generator itself.",
      (s, dir) => {
        import s.implicits._
        def edge(name: String, child: org.apache.spark.sql.DataFrame,
            ck: String, parent: org.apache.spark.sql.DataFrame, pk: String) =
          child
            .join(broadcast(parent.select(col(pk).as("__pk")).distinct()),
              col(ck) === col("__pk"), "left")
            .agg(count(lit(1)).as("child_rows"),
              sum(when(col("__pk").isNull, 1L).otherwise(0L))
                .as("orphan_rows"))
            .select(lit(name).as("edge"), col("child_rows"),
              col("orphan_rows"))
        val li = Tables.t(s, dir, "lineitem")
        val orders = Tables.t(s, dir, "orders")
        val cust = Tables.t(s, dir, "customer")
        val supp = Tables.t(s, dir, "supplier")
        val part = Tables.t(s, dir, "part")
        val nation = Tables.t(s, dir, "nation")
        val rows = Seq(
          edge("lineitem.l_orderkey->orders", li, "l_orderkey",
            orders, "o_orderkey"),
          edge("lineitem.l_partkey->part", li, "l_partkey",
            part, "p_partkey"),
          edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
            supp, "s_suppkey"),
          edge("orders.o_custkey->customer", orders, "o_custkey",
            cust, "c_custkey"),
          edge("customer.c_nationkey->nation", cust, "c_nationkey",
            nation, "n_nationkey"),
          edge("supplier.s_nationkey->nation", supp, "s_nationkey",
            nation, "n_nationkey"))
        rows.reduce(_ unionAll _)
          .select($"edge", $"child_rows", $"orphan_rows",
            expr("(orphan_rows * 10000) div child_rows").as("orphan_bp"))
          .orderBy($"edge")
      },
      Some("""
        WITH e AS (
          SELECT 'lineitem.l_orderkey->orders' AS edge,
                 (SELECT count(*) FROM lineitem) AS child_rows,
                 (SELECT count(*) FROM lineitem
                  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
                   AS orphan_rows
          UNION ALL
          SELECT 'lineitem.l_partkey->part',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM lineitem
                  WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
          UNION ALL
          SELECT 'lineitem.l_suppkey->supplier',
                 (SELECT count(*) FROM lineitem),
                 (SELECT count(*) FROM lineitem
                  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
          UNION ALL
          SELECT 'orders.o_custkey->customer',
                 (SELECT count(*) FROM orders),
                 (SELECT count(*) FROM orders
                  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
          UNION ALL
          SELECT 'customer.c_nationkey->nation',
                 (SELECT count(*) FROM customer),
                 (SELECT count(*) FROM customer
                  WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
          UNION ALL
          SELECT 'supplier.s_nationkey->nation',
                 (SELECT count(*) FROM supplier),
                 (SELECT count(*) FROM supplier
                  WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)))
        SELECT edge, CAST(child_rows AS BIGINT) AS child_rows,
               CAST(orphan_rows AS BIGINT) AS orphan_rows,
               CAST((orphan_rows * 10000) // child_rows AS BIGINT)
                 AS orphan_bp
        FROM e ORDER BY edge""")),

    Q(
      "q283_k_anonymity",
      "K-ANONYMITY / L-DIVERSITY AUDIT (Sweeney 2002 / Machanavajjhala " +
        "2007 — the re-identification risk gate a training-data release " +
        "runs beside q272's forget cascade): quasi-identifier (nation, " +
        "mktsegment), sensitive attribute = $1000 acctbal band, at TWO " +
        "generalization levels — level 0 as-is, level 1 with nation " +
        "generalized to region (one rung up the lattice, the standard " +
        "fix when level 0 fails). Per level: group count, worst-case k " +
        "(min group size — a group of 1 is a re-identification), " +
        "worst-case l (min distinct sensitive bands — l=1 means the QI " +
        "alone DISCLOSES the sensitive value even at k>1, the " +
        "homogeneity attack k-anonymity misses), and the ROW counts " +
        "exposed under k<5 / l<3. Plan: one row-scale groupBy on the " +
        "(level, QI) key (the union doubles rows but both legs " +
        "map-side-combine; nation->region is a 25-row broadcast), then " +
        "a 2-row level rollup. The distinct-l aggregate expands " +
        "per-group, bounded by the sband domain.",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.t(s, dir, "customer")
          .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
            // floor of one IEEE double division — engine-identical
            expr("cast(floor(c_acctbal / 1000) as bigint)").as("sband"))
        val nat = Tables.t(s, dir, "nation")
          .select($"n_nationkey", $"n_regionkey")
        val lvl0 = cust.select(lit(0L).as("level"),
          $"c_nationkey".cast("long").as("qi1"), $"c_mktsegment".as("qi2"),
          $"sband")
        val lvl1 = cust.join(broadcast(nat),
            $"c_nationkey" === $"n_nationkey")
          .select(lit(1L).as("level"),
            $"n_regionkey".cast("long").as("qi1"), $"c_mktsegment".as("qi2"),
            $"sband")
        lvl0.unionByName(lvl1)
          .groupBy($"level", $"qi1", $"qi2")
          .agg(count(lit(1)).as("k"), countDistinct($"sband").as("l"))
          .groupBy($"level")
          .agg(count(lit(1)).as("n_groups"),
            min($"k").as("k_min"), min($"l").as("l_min"),
            sum(when($"k" < 5, $"k").otherwise(0L)).as("rows_k_lt5"),
            sum(when($"l" < 3, $"k").otherwise(0L)).as("rows_l_lt3"))
          .orderBy($"level")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey, c_nationkey, c_mktsegment,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS sband
          FROM customer),
        u AS (
          SELECT 0 AS level, CAST(c_nationkey AS BIGINT) AS qi1,
                 c_mktsegment AS qi2, sband
          FROM cust
          UNION ALL
          SELECT 1, CAST(n.n_regionkey AS BIGINT), c.c_mktsegment, c.sband
          FROM cust c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        g AS (
          SELECT level, qi1, qi2, count(*) AS k,
                 count(DISTINCT sband) AS l
          FROM u GROUP BY 1, 2, 3)
        SELECT CAST(level AS BIGINT) AS level,
               count(*) AS n_groups,
               CAST(min(k) AS BIGINT) AS k_min,
               CAST(min(l) AS BIGINT) AS l_min,
               CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
                 AS rows_k_lt5,
               CAST(sum(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
                 AS rows_l_lt3
        FROM g GROUP BY level ORDER BY level""")),

    Q(
      "q329_t_closeness",
      "T-CLOSENESS AUDIT (Li 2007 — the third rung of the privacy " +
        "ladder after q283's k-anonymity and l-diversity, which both " +
        "miss the SKEW attack: a group can be k-anonymous and l-diverse " +
        "while its sensitive distribution still screams 'rich'): for " +
        "every (nation, mktsegment) QI group, the Earth-Mover's " +
        "Distance between the group's acctbal-band distribution and " +
        "the GLOBAL one, computed EXACTLY on the ordered band domain — " +
        "EMD = Σ|cumsum(P - Q)| / (m-1) becomes the integer " +
        "Σ|cum(n_gb·N - n_g·N_b)| over denominator n_g·N·(m-1) " +
        "(numerator carried as DECIMAL(38) for the ppm rendering — " +
        "products cross int64 at web scale, the q208 rule; emitted " +
        "BIGINT ppm). Summary: groups over the t = 0.3 bar, the rows " +
        "they expose, and the worst group's distance. Plan: ONE " +
        "row-scale (QI, band) aggregate with map-side partials; the " +
        "dense group x band grid, the cumulative window (PARTITIONED " +
        "by group, ordered by band), and the rollup all live on the " +
        "<= 125 x 11 bounded domain — a billion customers reduce to " +
        "one counter per cell.",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.t(s, dir, "customer")
          .select($"c_nationkey".cast("long").as("qi1"),
            $"c_mktsegment".as("qi2"),
            expr("cast(floor(c_acctbal / 1000) as bigint)").as("sband"))
        val cells = cust.groupBy($"qi1", $"qi2", $"sband")
          .agg(count(lit(1)).as("n_gb"))
          .localCheckpoint(true) // bounded cell frame, three consumers
        val glob = cells.groupBy($"sband").agg(sum($"n_gb").as("n_b"))
        val groups = cells.groupBy($"qi1", $"qi2")
          .agg(sum($"n_gb").as("n_g"))
        val tot = glob.agg(sum($"n_b").as("nn"),
          count(lit(1)).as("m"))
        val dense = groups
          .crossJoin(broadcast(glob))
          .join(cells, Seq("qi1", "qi2", "sband"), "left")
          .na.fill(0L, Seq("n_gb"))
          .crossJoin(broadcast(tot))
        val w = Window.partitionBy($"qi1", $"qi2").orderBy($"sband")
        val emd = dense
          .withColumn("cum",
            sum($"n_gb" * $"nn" - $"n_g" * $"n_b").over(w))
          .groupBy($"qi1", $"qi2")
          .agg(first($"n_g").as("n_g"), first($"nn").as("nn"),
            first($"m").as("m"), sum(abs($"cum")).as("emd_num"))
          .select($"qi1", $"qi2", $"n_g",
            expr("cast(cast(emd_num as decimal(38,0)) * 1000000 div " +
              "(n_g * nn * (m - 1)) as bigint)").as("emd_ppm"))
        emd.agg(
          count(lit(1)).as("n_groups"),
          max($"emd_ppm").as("max_emd_ppm"),
          sum(when($"emd_ppm" > 300000, 1L).otherwise(0L))
            .as("groups_over_t"),
          sum(when($"emd_ppm" > 300000, $"n_g").otherwise(0L))
            .as("rows_over_t"))
      },
      Some("""
        WITH cust AS (
          SELECT CAST(c_nationkey AS BIGINT) AS qi1,
                 c_mktsegment AS qi2,
                 CAST(floor(c_acctbal / 1000) AS BIGINT) AS sband
          FROM customer),
        cells AS (
          SELECT qi1, qi2, sband, CAST(count(*) AS BIGINT) AS n_gb
          FROM cust GROUP BY 1, 2, 3),
        gband AS (
          SELECT sband, CAST(sum(n_gb) AS BIGINT) AS n_b
          FROM cells GROUP BY 1),
        groups AS (
          SELECT qi1, qi2, CAST(sum(n_gb) AS BIGINT) AS n_g
          FROM cells GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS nn,
                       CAST(count(*) AS BIGINT) AS m FROM gband),
        dense AS (
          SELECT g.qi1, g.qi2, g.n_g, b.sband, b.n_b,
                 CAST(coalesce(c.n_gb, 0) AS BIGINT) AS n_gb,
                 t.nn, t.m
          FROM groups g CROSS JOIN gband b
          LEFT JOIN cells c
            ON c.qi1 = g.qi1 AND c.qi2 = g.qi2 AND c.sband = b.sband
          CROSS JOIN tot t),
        emd AS (
          SELECT qi1, qi2, any_value(n_g) AS n_g, any_value(nn) AS nn,
                 any_value(m) AS m,
                 CAST(sum(abs(cum)) AS BIGINT) AS emd_num
          FROM (
            SELECT qi1, qi2, n_g, nn, m,
                   sum(n_gb * nn - n_g * n_b) OVER (
                     PARTITION BY qi1, qi2 ORDER BY sband) AS cum
            FROM dense)
          GROUP BY qi1, qi2),
        scored AS (
          SELECT qi1, qi2, n_g,
                 CAST((emd_num * 1000000) // (n_g * nn * (m - 1))
                   AS BIGINT) AS emd_ppm
          FROM emd)
        SELECT count(*) AS n_groups,
               CAST(max(emd_ppm) AS BIGINT) AS max_emd_ppm,
               CAST(sum(CASE WHEN emd_ppm > 300000 THEN 1 ELSE 0 END)
                 AS BIGINT) AS groups_over_t,
               CAST(sum(CASE WHEN emd_ppm > 300000 THEN n_g ELSE 0 END)
                 AS BIGINT) AS rows_over_t
        FROM scored""")),

    Q(
      "q333_join_order_audit",
      "3-WAY JOIN-ORDER CARDINALITY AUDIT — q288 measures how wrong " +
        "the uniform estimate is per EDGE; this measures the DECISION " +
        "the estimate exists to make: for lineitem ⋈ orders ⋈ " +
        "customer, the exact intermediate each order would " +
        "materialize — |L⋈O| = Σ_k nl(k)·no(k) on orderkey vs |O⋈C| = " +
        "Σ_k no(k)·nc(k) on custkey — and the exact FINAL size " +
        "Σ_o nl(o.orderkey)·nc(o.custkey) (identical either way, " +
        "emitted once per plan as the invariant a broken audit would " +
        "break), all from per-key COUNT tables: the base facts are " +
        "each scanned once into slim (8-byte key, count) frames, the " +
        "final-size pass joins orders to both count frames and " +
        "aggregates the product — the wire carries counts, never fact " +
        "rows. Output: one row per plan with intermediate, final, " +
        "total pairwork, and the best-plan verdict (fixture: orders⋈" +
        "customer first — |O⋈C| = |O| since custkey is an FK — " +
        "beating the 4x-fan-out lineitem leg, the exact call a CBO " +
        "must make). At 100 TB the count frames are the same plan a " +
        "stats collector runs; everything after is bounded.",
      (s, dir) => {
        import s.implicits._
        val l = Tables.t(s, dir, "lineitem")
          .groupBy($"l_orderkey".as("ok")).agg(count(lit(1)).as("nl"))
        val c = Tables.t(s, dir, "customer")
          .groupBy($"c_custkey".as("ck")).agg(count(lit(1)).as("nc"))
        val o = Tables.t(s, dir, "orders")
          .select($"o_orderkey".as("ok"), $"o_custkey".as("ck"))
        val joined = o
          .join(l, Seq("ok"), "left")
          .join(c, Seq("ck"), "left")
          .select(coalesce($"nl", lit(0L)).as("nl"),
            coalesce($"nc", lit(0L)).as("nc"))
          .agg(sum($"nl").as("lo_rows"), sum($"nc").as("oc_rows"),
            sum($"nl" * $"nc").as("final_rows"))
          .localCheckpoint(true) // 1-row frame, two plan rows read it
        val plans = joined.select(
          explode(array(
            struct(lit("LO_then_C").as("plan"),
              $"lo_rows".as("intermediate_rows")),
            struct(lit("OC_then_L").as("plan"),
              $"oc_rows".as("intermediate_rows")))).as("p"),
          $"final_rows")
          .select($"p.plan".as("plan"), $"p.intermediate_rows",
            $"final_rows",
            ($"p.intermediate_rows" + $"final_rows").as("total_pairwork"))
        plans.crossJoin(broadcast(
            plans.agg(min($"total_pairwork").as("best"))))
          .select($"plan", $"intermediate_rows", $"final_rows",
            $"total_pairwork", ($"total_pairwork" === $"best").as("is_best"))
          .orderBy($"plan")
      },
      Some("""
        WITH l AS (SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT)
                     AS nl
                   FROM lineitem GROUP BY 1),
        c AS (SELECT c_custkey AS ck, CAST(count(*) AS BIGINT) AS nc
              FROM customer GROUP BY 1),
        o AS (SELECT o_orderkey AS ok, o_custkey AS ck FROM orders),
        j AS (
          SELECT CAST(sum(coalesce(l.nl, 0)) AS BIGINT) AS lo_rows,
                 CAST(sum(coalesce(c.nc, 0)) AS BIGINT) AS oc_rows,
                 CAST(sum(coalesce(l.nl, 0) * coalesce(c.nc, 0))
                   AS BIGINT) AS final_rows
          FROM o LEFT JOIN l USING (ok) LEFT JOIN c USING (ck)),
        plans AS (
          SELECT 'LO_then_C' AS plan, lo_rows AS intermediate_rows,
                 final_rows FROM j
          UNION ALL
          SELECT 'OC_then_L', oc_rows, final_rows FROM j)
        SELECT plan, intermediate_rows, final_rows,
               CAST(intermediate_rows + final_rows AS BIGINT)
                 AS total_pairwork,
               intermediate_rows + final_rows =
                 (SELECT min(intermediate_rows + final_rows) FROM plans)
                 AS is_best
        FROM plans ORDER BY plan""")),

    Q(
      "q288_join_size_estimate",
      "JOIN CARDINALITY ESTIMATION AUDIT — System R's textbook " +
        "|A|*|B|/max(ndv_a, ndv_b) uniform-key estimate (Selinger " +
        "1979, the formula every CBO starts from; CboStatsSpec shows " +
        "Spark USING such stats, this measures how WRONG they can be) " +
        "vs the EXACT join size sum_k n_a(k)*n_b(k), computed from two " +
        "per-key count aggregates WITHOUT materializing the join — the " +
        "estimator's-eye view of the catalog for the two biggest FK " +
        "edges (orders->customer, lineitem->orders). Signed error in " +
        "bp with the sign pulled out of the floor division (q263's " +
        "rule). The per-key count tables are map-side-combined and the " +
        "key-matched product is a join of COUNT tables (|keys| rows, " +
        "not |rows|) — at 100 TB this audit costs two aggregates, " +
        "never the join it sizes.",
      (s, dir) => {
        import s.implicits._
        def edge(name: String, a: org.apache.spark.sql.DataFrame,
            ka: String, b: org.apache.spark.sql.DataFrame, kb: String) = {
          val ca = a.groupBy(col(ka).as("k")).agg(count(lit(1)).as("na"))
          val cb = b.groupBy(col(kb).as("k")).agg(count(lit(1)).as("nb"))
          // ONE full-outer pass over the two count tables yields the
          // actual size AND every catalog statistic — splitting them
          // into separate consumers would scan each base table twice
          // (PlanSpec counts the scan leaves)
          ca.join(cb, Seq("k"), "full_outer")
            .agg(
              sum(when($"na".isNotNull && $"nb".isNotNull, $"na" * $"nb")
                .otherwise(0L)).as("actual_rows"),
              sum(coalesce($"na", lit(0L))).as("ra"),
              sum(when($"na".isNotNull, 1L).otherwise(0L)).as("da"),
              sum(coalesce($"nb", lit(0L))).as("rb"),
              sum(when($"nb".isNotNull, 1L).otherwise(0L)).as("db"))
            .select(lit(name).as("edge"),
              $"actual_rows",
              expr("(ra * rb) div greatest(da, db)").as("est_rows"))
            .withColumn("err_bp",
              expr("(case when est_rows < actual_rows then -1 else 1 end)" +
                " * ((abs(est_rows - actual_rows) * 10000)" +
                " div actual_rows)"))
        }
        edge("orders->customer",
            Tables.t(s, dir, "orders"), "o_custkey",
            Tables.t(s, dir, "customer"), "c_custkey")
          .unionByName(edge("lineitem->orders",
            Tables.t(s, dir, "lineitem"), "l_orderkey",
            Tables.t(s, dir, "orders"), "o_orderkey"))
          // (q333 extends this audit to the 3-way ORDER decision)
          .orderBy($"edge")
      },
      Some("""
        WITH e AS (
          SELECT 'orders->customer' AS edge, o_custkey AS ka
          FROM orders),
        f AS (SELECT c_custkey AS kb FROM customer),
        ca1 AS (SELECT ka AS k, count(*) AS na FROM e GROUP BY 1),
        cb1 AS (SELECT kb AS k, count(*) AS nb FROM f GROUP BY 1),
        a1 AS (SELECT CAST(sum(na * nb) AS BIGINT) AS actual_rows
               FROM ca1 JOIN cb1 USING (k)),
        s1 AS (SELECT (SELECT CAST(sum(na) AS BIGINT) FROM ca1) AS ra,
                      (SELECT count(*) FROM ca1) AS da,
                      (SELECT CAST(sum(nb) AS BIGINT) FROM cb1) AS rb,
                      (SELECT count(*) FROM cb1) AS db),
        e1 AS (SELECT 'orders->customer' AS edge, a1.actual_rows,
                      (s1.ra * s1.rb) // greatest(s1.da, s1.db) AS est_rows
               FROM a1, s1),
        g AS (SELECT l_orderkey AS ka FROM lineitem),
        h AS (SELECT o_orderkey AS kb FROM orders),
        ca2 AS (SELECT ka AS k, count(*) AS na FROM g GROUP BY 1),
        cb2 AS (SELECT kb AS k, count(*) AS nb FROM h GROUP BY 1),
        a2 AS (SELECT CAST(sum(na * nb) AS BIGINT) AS actual_rows
               FROM ca2 JOIN cb2 USING (k)),
        s2 AS (SELECT (SELECT CAST(sum(na) AS BIGINT) FROM ca2) AS ra,
                      (SELECT count(*) FROM ca2) AS da,
                      (SELECT CAST(sum(nb) AS BIGINT) FROM cb2) AS rb,
                      (SELECT count(*) FROM cb2) AS db),
        e2 AS (SELECT 'lineitem->orders' AS edge, a2.actual_rows,
                      (s2.ra * s2.rb) // greatest(s2.da, s2.db) AS est_rows
               FROM a2, s2),
        u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
        SELECT edge, actual_rows, est_rows,
               (CASE WHEN est_rows < actual_rows THEN -1 ELSE 1 END)
                 * ((abs(est_rows - actual_rows) * 10000) // actual_rows)
                 AS err_bp
        FROM u ORDER BY edge""")),

    Q(
      "q295_peak_concurrency",
      "PEAK CONCURRENCY via the sweep-line identity on the BOUNDED " +
        "minute domain — capacity planning's first question (how many " +
        "sessions at once?), which q189's interval ops don't answer: " +
        "every event opens a 10-minute activity lease; +1 at the start " +
        "minute and -1 at the end minute aggregate to a per-minute NET " +
        "table (the row-scale shuffle, map-side combined onto the " +
        "<= 43200-minute fixture span), one cumulative sum over the " +
        "minute domain turns nets into live concurrency (the " +
        "unpartitioned window is domain-bounded, q199's argument — " +
        "NEVER a running sum over raw events, which is the classic " +
        "sweep-line scale trap), and a day rollup reports each day's " +
        "peak and its first minute. Leases crossing midnight are " +
        "counted correctly because the cumsum runs over the GLOBAL " +
        "minute line, not per day. Exact integers end to end.",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.t(s, dir, "events")
          .select(expr("unix_micros(cast(ts as timestamp)) div 60000000")
            .as("m"))
        val net = ev.groupBy($"m").agg(count(lit(1)).as("d"))
          .unionByName(
            ev.select(($"m" + 10).as("m"))
              .groupBy($"m").agg((-count(lit(1))).as("d")))
          .groupBy($"m").agg(sum($"d").as("net"))
        val live = net.withColumn("cum",
          sum($"net").over(Window.orderBy($"m")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        live
          .withColumn("day_idx", expr("m div 1440"))
          .withColumn("day_peak",
            max($"cum").over(Window.partitionBy($"day_idx")))
          .groupBy($"day_idx")
          .agg(max($"cum").as("peak"),
            (min(when($"cum" === $"day_peak", $"m")) % 1440)
              .as("peak_minute"))
          .orderBy($"day_idx")
      },
      Some("""
        WITH ev AS (
          SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 60000000 AS m
          FROM events),
        net AS (
          SELECT m, CAST(sum(d) AS BIGINT) AS net FROM (
            SELECT m, count(*) AS d FROM ev GROUP BY m
            UNION ALL
            SELECT m + 10, -count(*) FROM ev GROUP BY m + 10) u
          GROUP BY m),
        live AS (
          SELECT m, sum(net) OVER (ORDER BY m
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM net),
        d AS (
          SELECT m // 1440 AS day_idx, m, cum,
                 max(cum) OVER (PARTITION BY m // 1440) AS day_peak
          FROM live)
        SELECT day_idx, CAST(max(cum) AS BIGINT) AS peak,
               CAST(min(CASE WHEN cum = day_peak THEN m END) % 1440
                 AS BIGINT) AS peak_minute
        FROM d GROUP BY day_idx ORDER BY day_idx""")),

    Q(
      "q296_subject_access_export",
      "DATA-SUBJECT ACCESS EXPORT (GDPR art. 15 — the READ side of " +
        "q272's art. 17 cascade, walking the SAME FK chain so the two " +
        "requests can never disagree about what 'the subject's data' " +
        "means): for one request batch (custkey % 499 = 0, the " +
        "deterministic stand-in for the request list), per subject and " +
        "table the row footprint, revenue-in-cents carried, and " +
        "first/last activity timestamps — customer row, orders by " +
        "custkey, lineitems through those orders, events by user id. " +
        "Every leg is a broadcast semi-join of the request list down " +
        "its own FK edge (the q272 key-per-edge plan read-only); the " +
        "per-(subject, table) rollup combines map-side. An empty leg " +
        "still yields the subject's row via the left join from the " +
        "request list — an export that silently OMITS a table is a " +
        "compliance bug, so absence must be an explicit zero.",
      (s, dir) => {
        import s.implicits._
        val subj = broadcast(Tables.t(s, dir, "customer")
          .filter($"c_custkey" % 499 === 0)
          .select($"c_custkey".as("subject")))
        val orders = Tables.t(s, dir, "orders")
          .join(subj, $"o_custkey" === $"subject")
        val li = Tables.t(s, dir, "lineitem")
          .join(broadcast(orders.select($"o_orderkey".as("lok"),
            $"subject".as("ls"))), $"l_orderkey" === $"lok")
        val ev = Tables.t(s, dir, "events")
          .join(subj, $"user_id" === $"subject")
        def leg(tbl: String, d: org.apache.spark.sql.DataFrame,
            sub: org.apache.spark.sql.Column, cents: org.apache.spark.sql.Column,
            ts: org.apache.spark.sql.Column) =
          d.groupBy(sub.as("subject"))
            .agg(count(lit(1)).as("n_rows"),
              sum(cents).as("cents"),
              min(ts).as("first_ts"), max(ts).as("last_ts"))
            .withColumn("tbl", lit(tbl))
        val legs =
          leg("orders", orders, $"subject",
            expr("cast(round(o_totalprice * 100) as bigint)"),
            $"o_orderdate".cast("timestamp_ntz"))
          .unionByName(leg("lineitem", li, $"ls",
            expr("cast(round(l_extendedprice * 100) as bigint)"),
            $"l_shipdate".cast("timestamp_ntz")))
          .unionByName(leg("events", ev, $"subject",
            expr("cast(round(value * 100) as bigint)"),
            $"ts".cast("timestamp_ntz")))
        subj.crossJoin(Seq("orders", "lineitem", "events").toDF("tbl"))
          .join(legs, Seq("subject", "tbl"), "left")
          .select($"subject", $"tbl",
            coalesce($"n_rows", lit(0L)).as("n_rows"),
            coalesce($"cents", lit(0L)).as("cents"),
            $"first_ts", $"last_ts")
          .orderBy($"subject", $"tbl")
      },
      Some("""
        WITH subj AS (
          SELECT c_custkey AS subject FROM customer
          WHERE c_custkey % 499 = 0),
        o AS (
          SELECT s.subject, o.*
          FROM orders o JOIN subj s ON o.o_custkey = s.subject),
        li AS (
          SELECT o.subject, l.*
          FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey),
        ev AS (
          SELECT s.subject, e.*
          FROM events e JOIN subj s ON e.user_id = s.subject),
        legs AS (
          SELECT subject, 'orders' AS tbl, count(*) AS n_rows,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS cents,
                 min(CAST(o_orderdate AS TIMESTAMP)) AS first_ts,
                 max(CAST(o_orderdate AS TIMESTAMP)) AS last_ts
          FROM o GROUP BY 1
          UNION ALL
          SELECT subject, 'lineitem', count(*),
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT),
                 min(CAST(l_shipdate AS TIMESTAMP)),
                 max(CAST(l_shipdate AS TIMESTAMP))
          FROM li GROUP BY 1
          UNION ALL
          SELECT subject, 'events', count(*),
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT),
                 min(CAST(ts AS TIMESTAMP)), max(CAST(ts AS TIMESTAMP))
          FROM ev GROUP BY 1),
        grid AS (
          SELECT s.subject, t.tbl
          FROM subj s CROSS JOIN
            (SELECT unnest(['orders', 'lineitem', 'events']) AS tbl) t)
        SELECT g.subject, g.tbl,
               coalesce(l.n_rows, 0) AS n_rows,
               coalesce(l.cents, 0) AS cents,
               l.first_ts, l.last_ts
        FROM grid g LEFT JOIN legs l
          ON g.subject = l.subject AND g.tbl = l.tbl
        ORDER BY g.subject, g.tbl""")),

    Q(
      "q302_cross_table_dq_rules",
      "CROSS-TABLE DATA-QUALITY RULE SUITE — the reconciliation tier " +
        "between q220's single-scan contract and q273's FK audit: " +
        "rules that need a JOIN to evaluate. (1) header/detail " +
        "reconciliation — orders whose o_totalprice disagrees with " +
        "their lineitems' extendedprice sum by more than $1 (cents " +
        "compare, no float equality); (2) temporal causality — " +
        "lineitems shipped BEFORE their order date; (3) domain rules " +
        "on the detail scan (non-positive price, discount outside " +
        "[0, 0.10], quantity outside [1, 50]) — evaluated in the SAME " +
        "aggregate pass as the reconciliation so the detail table " +
        "scans once. Output one row per rule: population, violations, " +
        "rate bp. On the synthetic fixtures the suite BITES: header " +
        "totals reconcile for zero orders and ~49% of lines ship " +
        "before their order date (fixture facts the audit exists to " +
        "surface, not engine defects — the domain rules all pass). " +
        "Plan: one orderkey-shuffled join + two aggregates; " +
        "the rule fan-out is column arithmetic, not extra passes — at " +
        "100 TB this is the nightly reconciliation job shape.",
      (s, dir) => {
        import s.implicits._
        val o = Tables.t(s, dir, "orders")
          .select($"o_orderkey",
            expr("cast(round(o_totalprice * 100) as bigint)").as("hdr_cents"),
            $"o_orderdate")
        val l = Tables.t(s, dir, "lineitem")
          .select($"l_orderkey",
            expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"),
            $"l_shipdate", $"l_discount", $"l_quantity")
        val j = l.join(o, $"l_orderkey" === $"o_orderkey")
        val perOrder = j.groupBy($"o_orderkey")
          .agg(min($"hdr_cents").as("hdr_cents"),
            sum($"cents").as("dtl_cents"),
            sum(when($"l_shipdate" < $"o_orderdate", 1L).otherwise(0L))
              .as("early_ships"),
            count(lit(1)).as("n_lines"),
            sum(when($"cents" <= 0, 1L).otherwise(0L)).as("bad_price"),
            sum(when($"l_discount" < 0 || $"l_discount" > 0.10001, 1L)
              .otherwise(0L)).as("bad_disc"),
            sum(when($"l_quantity" < 1 || $"l_quantity" > 50, 1L)
              .otherwise(0L)).as("bad_qty"))
        val tot = perOrder.agg(
          count(lit(1)).as("n_orders"),
          sum(when(abs($"hdr_cents" - $"dtl_cents") > 100, 1L)
            .otherwise(0L)).as("recon_viol"),
          sum($"n_lines").as("n_lines"),
          sum($"early_ships").as("early_viol"),
          sum($"bad_price").as("price_viol"),
          sum($"bad_disc").as("disc_viol"),
          sum($"bad_qty").as("qty_viol"))
        tot.select(
            expr("stack(5, " +
              "'total_reconciliation', n_orders, recon_viol, " +
              "'ship_before_order', n_lines, early_viol, " +
              "'nonpositive_price', n_lines, price_viol, " +
              "'discount_range', n_lines, disc_viol, " +
              "'quantity_range', n_lines, qty_viol) " +
              "as (rule, n_checked, n_violations)"))
          .withColumn("viol_bp",
            expr("(n_violations * 10000) div n_checked"))
          .orderBy($"rule")
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS hdr_cents,
                 o_orderdate
          FROM orders),
        l AS (
          SELECT l_orderkey,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 l_shipdate, l_discount, l_quantity
          FROM lineitem),
        p AS (
          SELECT o.o_orderkey, min(o.hdr_cents) AS hdr_cents,
                 CAST(sum(l.cents) AS BIGINT) AS dtl_cents,
                 CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate
                               THEN 1 ELSE 0 END) AS BIGINT) AS early_ships,
                 count(*) AS n_lines,
                 CAST(sum(CASE WHEN l.cents <= 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS bad_price,
                 CAST(sum(CASE WHEN l.l_discount < 0
                                 OR l.l_discount > 0.10001
                               THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
                 CAST(sum(CASE WHEN l.l_quantity < 1 OR l.l_quantity > 50
                               THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty
          FROM l JOIN o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1),
        t AS (
          SELECT count(*) AS n_orders,
                 CAST(sum(CASE WHEN abs(hdr_cents - dtl_cents) > 100
                               THEN 1 ELSE 0 END) AS BIGINT) AS recon_viol,
                 CAST(sum(n_lines) AS BIGINT) AS n_lines,
                 CAST(sum(early_ships) AS BIGINT) AS early_viol,
                 CAST(sum(bad_price) AS BIGINT) AS price_viol,
                 CAST(sum(bad_disc) AS BIGINT) AS disc_viol,
                 CAST(sum(bad_qty) AS BIGINT) AS qty_viol
          FROM p),
        rules AS (
          SELECT 'total_reconciliation' AS rule, n_orders AS n_checked,
                 recon_viol AS n_violations FROM t
          UNION ALL SELECT 'ship_before_order', n_lines, early_viol FROM t
          UNION ALL SELECT 'nonpositive_price', n_lines, price_viol FROM t
          UNION ALL SELECT 'discount_range', n_lines, disc_viol FROM t
          UNION ALL SELECT 'quantity_range', n_lines, qty_viol FROM t)
        SELECT rule, n_checked, n_violations,
               (n_violations * 10000) // n_checked AS viol_bp
        FROM rules ORDER BY rule"""))
  ,

    Q(
      "q308_temperature_mixture",
      "TEMPERATURE-SCALED MIXTURE PLANNER — q124 APPLIES given " +
        "per-language weights; this derives them: the standard " +
        "alpha-temperature family p_l proportional to T_l^alpha over " +
        "per-language token mass, emitted at alpha=1 (natural — " +
        "majority languages dominate), alpha=0.5 (the multilingual-" +
        "training default — minority languages boosted toward parity) " +
        "and alpha=0 (uniform), plus the effective epochs-per-language " +
        "the alpha=0.5 mixture implies at a one-corpus-pass token " +
        "budget (minority langs > 1e6 ppm = upsampled repeats, the " +
        "q124 explode; majority < 1e6 = subsampled). EXACT INTEGER " +
        "arithmetic throughout the cross-engine surface: T_l^0.5 " +
        "enters as floor(sqrt(T_l * 1e6)) — IEEE-754 sqrt is " +
        "correctly rounded, so floor of it on a <2^53 integer is " +
        "bit-deterministic on both engines (no engine-libm risk, the " +
        "q127/q238 micro-literal discipline) — and every share is a " +
        "cross-multiplied ppm div. One row-scale aggregate on lang; " +
        "everything after lives on the 5-row language domain with a " +
        "1-row broadcast total.",
      (s, dir) => {
        import s.implicits._
        // snap the 5-row lang aggregate: it feeds both the output rows
        // and the totals, and without the snap Spark would re-run the
        // document scan once per consumer
        val t = Tables.t(s, dir, "documents")
          .groupBy($"lang")
          .agg(sum(size(split(trim($"text"), " ")).cast("long"))
            .as("tokens"))
          .withColumn("w",
            floor(sqrt($"tokens".cast("double") * 1e6)).cast("long"))
          .localCheckpoint(true)
        val tots = t.agg(sum($"tokens").as("tot"), sum($"w").as("wtot"),
          count(lit(1)).as("nl"))
        t.crossJoin(broadcast(tots))
          .select($"lang", $"tokens",
            expr("tokens * 1000000 DIV tot").as("share_natural_ppm"),
            expr("w * 1000000 DIV wtot").as("share_temp_ppm"),
            expr("1000000 DIV nl").as("share_uniform_ppm"),
            expr("(w * 1000000 DIV wtot) * tot DIV tokens")
              .as("epochs_temp_ppm"))
          .orderBy($"lang")
      },
      Some("""
        WITH t AS (
          SELECT lang,
                 CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT)
                   AS tokens
          FROM documents GROUP BY lang),
        w AS (SELECT lang, tokens,
                     CAST(floor(sqrt(CAST(tokens AS DOUBLE) * 1e6))
                       AS BIGINT) AS w
              FROM t),
        tots AS (SELECT CAST(sum(tokens) AS BIGINT) AS tot,
                        CAST(sum(w) AS BIGINT) AS wtot,
                        CAST(count(*) AS BIGINT) AS nl
                 FROM w)
        SELECT lang, tokens,
               tokens * 1000000 // tot AS share_natural_ppm,
               w * 1000000 // wtot AS share_temp_ppm,
               1000000 // nl AS share_uniform_ppm,
               (w * 1000000 // wtot) * tot // tokens AS epochs_temp_ppm
        FROM w CROSS JOIN tots
        ORDER BY lang""")),

    Q(
      "q311_packing_sweep",
      "CONTEXT-WINDOW PACKING SWEEP — q188 audits the pad/truncation " +
        "ledger at ONE window (512); this sweeps {128, 256, 512, 1024} " +
        "and puts both strategies side by side per window: concat-" +
        "then-chunk packing (q117 — sequences = ceil(total_tokens/w), " +
        "utilization ~100%) vs one-doc-per-sequence with truncation " +
        "at w (pad tokens burn compute, truncated tokens burn DATA), " +
        "each with exact integer utilization bp. The sweep is how the " +
        "window size is actually chosen: pad waste FALLS and " +
        "truncation loss RISES with w, and this table is the " +
        "crossover evidence. Plan: ONE row-scale pass reduces docs to " +
        "(doc, token_len) slim pairs, the 4-row window domain " +
        "cross-joins onto them (explode of a literal array — a 4x " +
        "fan-out of 16-byte rows, not of documents), and one (window)-" +
        "keyed aggregate with map-side partials finishes; at 100 TB " +
        "the dominant cost stays the single documents scan.",
      (s, dir) => {
        import s.implicits._
        val lens = Tables.t(s, dir, "documents")
          .select($"doc_id",
            size(split(trim($"text"), " ")).cast("long").as("len"))
        lens.withColumn("w",
            explode(typedLit(Seq(128L, 256L, 512L, 1024L))))
          .groupBy($"w")
          .agg(count(lit(1)).as("n_docs"),
            sum($"len").as("total_tokens"),
            sum(least($"len", $"w")).as("kept_tokens"),
            sum(greatest($"len" - $"w", lit(0L))).as("truncated_tokens"),
            sum($"w" - least($"len", $"w")).as("pad_tokens"))
          .select($"w".as("ctx_window"), $"n_docs", $"total_tokens",
            expr("(total_tokens + ctx_window - 1) DIV ctx_window")
              .as("packed_seqs"),
            expr("total_tokens * 10000 DIV " +
              "(((total_tokens + ctx_window - 1) DIV ctx_window) * ctx_window)")
              .as("packed_util_bp"),
            $"pad_tokens", $"truncated_tokens",
            expr("kept_tokens * 10000 DIV (n_docs * ctx_window)")
              .as("nopack_util_bp"),
            expr("truncated_tokens * 10000 DIV total_tokens")
              .as("truncated_bp"))
          .orderBy($"ctx_window")
      },
      Some("""
        WITH lens AS (
          SELECT doc_id,
                 CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS len
          FROM documents),
        grid AS (SELECT CAST(unnest([128, 256, 512, 1024]) AS BIGINT) AS w),
        g AS (
          SELECT w, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len) AS BIGINT) AS total_tokens,
                 CAST(sum(least(len, w)) AS BIGINT) AS kept_tokens,
                 CAST(sum(greatest(len - w, 0)) AS BIGINT)
                   AS truncated_tokens,
                 CAST(sum(w - least(len, w)) AS BIGINT) AS pad_tokens
          FROM lens CROSS JOIN grid GROUP BY w)
        SELECT w AS ctx_window, n_docs, total_tokens,
               (total_tokens + w - 1) // w AS packed_seqs,
               total_tokens * 10000
                 // (((total_tokens + w - 1) // w) * w) AS packed_util_bp,
               pad_tokens, truncated_tokens,
               kept_tokens * 10000 // (n_docs * w) AS nopack_util_bp,
               truncated_tokens * 10000 // total_tokens AS truncated_bp
        FROM g ORDER BY ctx_window""")),

    Q(
      "q320_length_match_resample",
      "DISTRIBUTION-MATCHING REJECTION RESAMPLER — downsample a corpus " +
        "so its length histogram matches a TARGET shape (here the " +
        "triangular weights 1..10 over ten literal 60-char bands — the " +
        "long-docs-overweighted mix an SFT run asks for), the " +
        "complement of q124's source mixture (which reweights SOURCES; " +
        "this reshapes a marginal DISTRIBUTION): the largest total T " +
        "preserving exact proportions is min over bands of " +
        "floor(n_k*55/w_k) (one band is always the binding constraint " +
        "— emitted as `binding`), each band keeps kept_k = w_k*T div 55 " +
        "docs, and MEMBERSHIP is deterministic — rank by md5(doc_id) " +
        "within band (q99's engine-independent hash convention: any " +
        "subset rerun reproduces the same sample, which seeded RNG " +
        "cannot) and keep the first kept_k. Per band: population, " +
        "target weight, kept count, achieved share vs target share in " +
        "ppm. Plan: one row-scale pass to the 10-band histogram, the " +
        "T/kept_k arithmetic on the 10-row domain, then the membership " +
        "pass — a band-partitioned rank window (bands are balanced by " +
        "construction, no skewed partition) against broadcast kept_k. " +
        "At 100 TB the rank window would swap for a per-band md5 " +
        "threshold learned from q168's CDF — same two-pass shape.",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
          .select($"doc_id",
            least(expr("n_chars div 60"), lit(9)).as("band"),
            md5($"doc_id".cast("string")).as("h"))
        val hist = docs.groupBy($"band")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("w", $"band" + 1)
        val t = hist.agg(min(expr("n_docs * 55 div w")).as("t"))
        val plan = hist.crossJoin(broadcast(t))
          .select($"band", $"n_docs", $"w",
            expr("(w * t) div 55").as("kept"), $"t")
        val kept = docs
          .withColumn("rk", row_number().over(
            Window.partitionBy($"band").orderBy($"h", $"doc_id")))
          .join(broadcast(plan.select($"band", $"kept")), Seq("band"))
          .filter($"rk" <= $"kept")
          .groupBy($"band").agg(count(lit(1)).as("n_kept"))
        plan.join(kept, Seq("band"), "left")
          .select($"band", $"n_docs", $"w".as("target_w"),
            coalesce($"n_kept", lit(0L)).as("kept"),
            expr("CASE WHEN t = 0 THEN 0 ELSE " +
              "(coalesce(n_kept, 0) * 1000000) div t END")
              .as("achieved_ppm"),
            expr("(w * 1000000) div 55").as("target_ppm"),
            (expr("n_docs * 55 div w") === $"t").as("binding"))
          .orderBy($"band")
      },
      Some("""
        WITH docs AS (
          SELECT doc_id, least(n_chars // 60, 9) AS band,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        hist AS (
          SELECT band, count(*) AS n_docs, band + 1 AS w
          FROM docs GROUP BY band),
        t AS (SELECT min(n_docs * 55 // w) AS t FROM hist),
        plan AS (
          SELECT band, n_docs, w, (w * t.t) // 55 AS kept, t.t AS t
          FROM hist CROSS JOIN t),
        ranked AS (
          SELECT d.band,
                 row_number() OVER (PARTITION BY d.band
                                    ORDER BY d.h, d.doc_id) AS rk,
                 d.h
          FROM docs d),
        kept AS (
          SELECT r.band, count(*) AS n_kept
          FROM ranked r JOIN plan p ON r.band = p.band
          WHERE r.rk <= p.kept GROUP BY r.band)
        SELECT CAST(p.band AS BIGINT) AS band,
               CAST(p.n_docs AS BIGINT) AS n_docs,
               CAST(p.w AS BIGINT) AS target_w,
               CAST(coalesce(k.n_kept, 0) AS BIGINT) AS kept,
               CAST(CASE WHEN p.t = 0 THEN 0 ELSE
                 (coalesce(k.n_kept, 0) * 1000000) // p.t END AS BIGINT)
                 AS achieved_ppm,
               CAST((p.w * 1000000) // 55 AS BIGINT) AS target_ppm,
               p.n_docs * 55 // p.w = p.t AS binding
        FROM plan p LEFT JOIN kept k ON p.band = k.band
        ORDER BY p.band""")),

    Q(
      "q326_largest_remainder_quota",
      "LARGEST-REMAINDER (Hamilton) SHARD APPORTIONMENT — allocate " +
        "EXACTLY 1000 training shards across sources proportional to " +
        "token mass: q308's floor shares never sum to the total (the " +
        "rounding gap q191's balanced shards paper over per shard); " +
        "Hamilton closes it exactly — base_i = (tokens_i*1000) div T, " +
        "and the L = 1000 - Σbase_i leftover shards go to the L " +
        "largest remainders (tokens_i*1000 mod T, ties by source asc — " +
        "deterministic on both engines). The allocation provably sums " +
        "to 1000 (emitted as the total_check column — drift goes " +
        "driver-red) with every source within 1 shard of its exact " +
        "quota, which per-source flooring cannot guarantee. Plan: one " +
        "row-scale (source) token aggregate with map-side partials, a " +
        "1-row broadcast total, rank-the-remainders on the 20-row " +
        "source domain — a billion docs reduce to one counter per " +
        "source.",
      (s, dir) => {
        import s.implicits._
        val toks = Tables.t(s, dir, "documents")
          .select($"source",
            size(filter(split(trim($"text"), " "), x => x =!= lit("")))
              .cast("long").as("tk"))
          .groupBy($"source").agg(sum($"tk").as("tokens"))
        val t = broadcast(toks.agg(sum($"tokens").as("t")))
        val w = Window.orderBy(
          expr("(tokens * 1000) % t").desc, $"source".asc)
        val alloc = toks.crossJoin(t)
          .select($"source", $"tokens", $"t",
            expr("(tokens * 1000) div t").as("base"),
            expr("(tokens * 1000) % t").as("rem"))
          .withColumn("rk", row_number().over(w))
        alloc
          .crossJoin(broadcast(alloc.agg(
            (lit(1000L) - sum($"base")).as("leftover"))))
          .select($"source", $"tokens", $"base",
            when($"rk" <= $"leftover", 1L).otherwise(0L).as("extra"))
          .withColumn("shards", $"base" + $"extra")
          // unpartitioned window is fine HERE: it runs on the bounded
          // 20-row source domain, never on rows
          .withColumn("total_check",
            sum($"shards").over(Window.partitionBy(lit(1))))
          .orderBy($"source")
      },
      Some("""
        WITH toks AS (
          SELECT source,
                 CAST(sum(len(list_filter(string_split(trim(text), ' '),
                   x -> x <> ''))) AS BIGINT) AS tokens
          FROM documents GROUP BY source),
        t AS (SELECT CAST(sum(tokens) AS BIGINT) AS t FROM toks),
        a AS (
          SELECT source, tokens,
                 CAST((tokens * 1000) // t.t AS BIGINT) AS base,
                 CAST((tokens * 1000) % t.t AS BIGINT) AS rem
          FROM toks, t),
        r AS (
          SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source)
                   AS BIGINT) AS rk,
                 (SELECT 1000 - sum(base) FROM a) AS leftover
          FROM a),
        f AS (
          SELECT source, tokens, base,
                 CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS extra
          FROM r)
        SELECT source, tokens, base, CAST(extra AS BIGINT) AS extra,
               CAST(base + extra AS BIGINT) AS shards,
               CAST((SELECT sum(base + extra) FROM f) AS BIGINT)
                 AS total_check
        FROM f ORDER BY source""")),

    Q(
      "q327_cohort_ltv",
      "COHORT LTV CURVE — the revenue continuation of q91's retention " +
        "matrix: users cohorted by FIRST-purchase week (q91's " +
        "year-qualified date_trunc('week') convention), each later " +
        "purchase lands in its weekly age bucket (datediff div 7 — " +
        "non-negative by construction, so floor == truncate and the " +
        "div is engine-safe), and the curve is the RUNNING cumulative " +
        "revenue per cohort with per-user LTV in exact floor cents " +
        "(cum_cents div cohort_size). This is the table a " +
        "payback-period decision reads row by row. Plan: one user_id " +
        "aggregate for first-purchase (the only row-scale shuffle " +
        "beyond the purchase scan), one (cohort, age) cell aggregate " +
        "with map-side partials, then the cumulative window runs " +
        "PARTITIONED BY COHORT on the bounded (weeks x ages) domain — " +
        "never on rows. A billion users reduce to one row per " +
        "(cohort week, age week).",
      (s, dir) => {
        import s.implicits._
        val pur = Tables.t(s, dir, "events")
          .filter($"event_type" === "purchase")
          .select($"user_id",
            date_trunc("week", $"ts").cast("date").as("wk"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
        val first = pur.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
          .localCheckpoint(true) // feeds the cell grain AND cohort sizes
        val cells = pur.join(first, Seq("user_id"))
          .groupBy($"cohort_wk",
            expr("cast(datediff(wk, cohort_wk) div 7 as bigint)")
              .as("age_wk"))
          .agg(sum($"cents").as("wk_cents"))
        val sizes = first.groupBy($"cohort_wk")
          .agg(count(lit(1)).as("cohort_size"))
        cells.join(sizes, Seq("cohort_wk"))
          .withColumn("cum_cents", sum($"wk_cents").over(
            Window.partitionBy($"cohort_wk").orderBy($"age_wk")))
          .select($"cohort_wk", $"age_wk", $"cohort_size",
            $"wk_cents", $"cum_cents",
            expr("cum_cents div cohort_size").as("ltv_cents"))
          .orderBy($"cohort_wk", $"age_wk")
      },
      Some("""
        WITH pur AS (
          SELECT user_id,
                 CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
                   AS wk,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        first AS (SELECT user_id, min(wk) AS cohort_wk
                  FROM pur GROUP BY user_id),
        cells AS (
          SELECT f.cohort_wk,
                 CAST(date_diff('day', f.cohort_wk, p.wk) // 7 AS BIGINT)
                   AS age_wk,
                 CAST(sum(p.cents) AS BIGINT) AS wk_cents
          FROM pur p JOIN first f USING (user_id)
          GROUP BY 1, 2),
        sizes AS (SELECT cohort_wk, CAST(count(*) AS BIGINT)
                    AS cohort_size
                  FROM first GROUP BY cohort_wk),
        cum AS (
          SELECT c.cohort_wk, c.age_wk, s.cohort_size, c.wk_cents,
                 CAST(sum(c.wk_cents) OVER (PARTITION BY c.cohort_wk
                   ORDER BY c.age_wk) AS BIGINT) AS cum_cents
          FROM cells c JOIN sizes s USING (cohort_wk))
        SELECT cohort_wk, age_wk, cohort_size, wk_cents, cum_cents,
               CAST(cum_cents // cohort_size AS BIGINT) AS ltv_cents
        FROM cum ORDER BY cohort_wk, age_wk""")),

    Q(
      "q337_dsir_selection",
      "IMPORTANCE-RESAMPLING DATA SELECTION (the DSIR recipe, Xie et " +
        "al. 2023): score every RAW-pool doc by how much more likely " +
        "its unigrams are under the TARGET domain (sources src0+src1) " +
        "than under the raw pool, log w = sum log p_tgt(tok) - " +
        "log p_raw(tok) with add-1 smoothing — quantized to exact " +
        "half-bits via length(bin(x^2))-1 so both engines agree to " +
        "the bit (the same no-libm isqrt/bin-length family as " +
        "q308/q336; BIGINT-safe to ~3e9-token corpora). The top-20 " +
        "raw docs are what a target-seeking pretraining mix admits " +
        "first. Plan: ONE token-grain groupBy builds BOTH frequency " +
        "columns as conditional partial aggs (no second corpus pass, " +
        "no per-domain vocab join); the corpus totals (N_t, N_r, V) " +
        "are a 1-row sum of that vocab frame, broadcast; raw tokens " +
        "rejoin the vocab on token; the per-doc sum collapses on " +
        "doc_id; the rank window runs AFTER orderBy+limit(20) on the " +
        "bounded list (never a corpus-wide empty-partition window).",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val tgt = Seq("src0", "src1")
        val tok = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang", $"source",
            $"source".isin(tgt: _*).as("is_tgt"),
            explode(split(trim($"text"), " ")).as("token"))
        val vocab = tok.groupBy($"token")
          .agg(sum(when($"is_tgt", 1L).otherwise(0L)).as("ct"),
            sum(when(!$"is_tgt", 1L).otherwise(0L)).as("cr"))
          .localCheckpoint(true)
        val tot = broadcast(vocab.agg(
          sum($"ct").as("nt"), sum($"cr").as("nr"),
          count(lit(1)).as("v")))
        def hb2(x: String) = s"(length(bin(($x) * ($x))) - 1)"
        val scored = tok.filter(!$"is_tgt")
          .join(vocab, "token").crossJoin(tot)
          .select($"doc_id", $"lang", $"source",
            expr(s"cast(${hb2("ct + 1")} - ${hb2("cr + 1")} as bigint)")
              .as("term"),
            expr(s"cast(${hb2("nr + v")} - ${hb2("nt + v")} as bigint)")
              .as("norm"))
          .groupBy($"doc_id", $"lang", $"source")
          .agg(count(lit(1)).as("n_tokens"),
            (sum($"term") + max($"norm") * count(lit(1))).as("dsir_hb"))
        scored.orderBy($"dsir_hb".desc, $"doc_id").limit(20)
          .withColumn("rk", row_number().over(
            Window.orderBy($"dsir_hb".desc, $"doc_id")).cast("long"))
          .select($"rk", $"doc_id", $"lang", $"source", $"n_tokens",
            $"dsir_hb")
          .orderBy($"rk")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, lang, source,
                 source IN ('src0', 'src1') AS is_tgt,
                 unnest(string_split(trim(text), ' ')) AS token
          FROM documents),
        vocab AS (
          SELECT token,
                 CAST(sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS BIGINT)
                   AS ct,
                 CAST(sum(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS BIGINT)
                   AS cr
          FROM tok GROUP BY 1),
        tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
                       CAST(sum(cr) AS BIGINT) AS nr,
                       CAST(count(*) AS BIGINT) AS v FROM vocab),
        scored AS (
          SELECT doc_id, lang, source,
                 CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum((length(bin((ct + 1) * (ct + 1))) - 1)
                        - (length(bin((cr + 1) * (cr + 1))) - 1))
                   + max((length(bin((nr + v) * (nr + v))) - 1)
                        - (length(bin((nt + v) * (nt + v))) - 1))
                     * count(*) AS BIGINT) AS dsir_hb
          FROM tok JOIN vocab USING (token) CROSS JOIN tot
          WHERE NOT is_tgt
          GROUP BY 1, 2, 3),
        r AS (
          SELECT CAST(row_number() OVER (ORDER BY dsir_hb DESC, doc_id)
                   AS BIGINT) AS rk,
                 doc_id, lang, source, n_tokens, dsir_hb
          FROM scored)
        SELECT rk, doc_id, lang, source, n_tokens, dsir_hb
        FROM r WHERE rk <= 20 ORDER BY rk""")),

    Q(
      "q338_dp_histogram",
      "DIFFERENTIAL-PRIVACY HISTOGRAM RELEASE — the governance rung " +
        "ABOVE q283/q329's k-anonymity/t-closeness (those audit a " +
        "release; this MAKES one): per-(lang, source) doc counts over " +
        "the full public domain grid (structural zeros included — " +
        "absent cells leak exactly the membership DP protects) plus " +
        "two-sided geometric noise at alpha = 1/2, i.e. epsilon = ln 2 " +
        "exactly. alpha = 1/2 is what makes the mechanism an INTEGER " +
        "program: P(k) = (1/3)(1/2)^|k| has cell masses 2^(20-|k|) " +
        "over denominator 3*2^20, so the inverse-CDF table is 41 " +
        "BIGINT literals (tail mass folded into the +-20 buckets) and " +
        "sampling = counting thresholds <= a uniform draw — no exp(), " +
        "no rejection loop, bit-identical on both engines. The draw " +
        "is the repo LCG on a poly-hashed cell key (q293's " +
        "scramble-then-multiply recipe). Released = max(true + " +
        "noise, 0) — the standard non-negativity post-process, which " +
        "costs no privacy. Plan: ONE (lang, source) aggregate " +
        "(localCheckpoint — the 100-cell frame feeds the lang domain, " +
        "the source domain, and the join), dense grid by crossJoin of " +
        "the two broadcast domains, everything after on the bounded " +
        "cell domain.",
      (s, dir) => {
        import s.implicits._
        val cum = Seq(2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L,
          1024L, 2048L, 4096L, 8192L, 16384L, 32768L, 65536L, 131072L,
          262144L, 524288L, 1048576L, 2097152L, 2621440L, 2883584L,
          3014656L, 3080192L, 3112960L, 3129344L, 3137536L, 3141632L,
          3143680L, 3144704L, 3145216L, 3145472L, 3145600L, 3145664L,
          3145696L, 3145712L, 3145720L, 3145724L, 3145726L, 3145728L)
        val cnt = Tables.t(s, dir, "documents")
          .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        val grid = broadcast(cnt.select($"lang").distinct())
          .crossJoin(broadcast(cnt.select($"source").distinct()))
        grid.join(cnt, Seq("lang", "source"), "left")
          .withColumn("n", coalesce($"n", lit(0L)))
          .withColumn("key", expr(
            "aggregate(transform(split(concat(lang, '|', source), ''), " +
              "ch -> ascii(ch)), 0L, " +
              "(h, b) -> (h * 263 + b) % 1000000007)"))
          .withColumn("u", expr(
            "((key * 1103515245 + 12345) % 2147483647) * 48271 " +
              "% 2147483647 % 3145728"))
          .withColumn("noise",
            (size(filter(typedLit(cum), t => t <= $"u")) - 20)
              .cast("long"))
          .select($"lang", $"source",
            greatest($"n" + $"noise", lit(0L)).as("released"))
          .orderBy($"lang", $"source")
      },
      Some("""
        WITH cnt AS (
          SELECT lang, source, CAST(count(*) AS BIGINT) AS n
          FROM documents GROUP BY 1, 2),
        grid AS (
          SELECT l.lang, s.source
          FROM (SELECT DISTINCT lang FROM cnt) l
          CROSS JOIN (SELECT DISTINCT source FROM cnt) s),
        cell AS (
          SELECT g.lang, g.source, coalesce(c.n, 0) AS n,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [CAST(ascii(ch) AS BIGINT) for ch in
                    string_split(g.lang || '|' || g.source, '')]),
                   (h, b) -> (h * 263 + b) % 1000000007) AS key
          FROM grid g LEFT JOIN cnt c
            ON g.lang = c.lang AND g.source = c.source),
        drawn AS (
          SELECT lang, source, n,
                 ((key * 1103515245 + 12345) % 2147483647) * 48271
                   % 2147483647 % 3145728 AS u
          FROM cell)
        SELECT lang, source,
               CAST(greatest(n + len(list_filter([2, 4, 8, 16, 32, 64,
                 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
                 65536, 131072, 262144, 524288, 1048576, 2097152,
                 2621440, 2883584, 3014656, 3080192, 3112960, 3129344,
                 3137536, 3141632, 3143680, 3144704, 3145216, 3145472,
                 3145600, 3145664, 3145696, 3145712, 3145720, 3145724,
                 3145726, 3145728], t -> t <= u)) - 20, 0) AS BIGINT)
                 AS released
        FROM drawn
        ORDER BY lang, source""")),

    Q(
      "q370_randomized_response",
      "LOCAL DIFFERENTIAL PRIVACY VIA RANDOMIZED RESPONSE (Warner " +
        "1965 — the client-side mechanism under q338's central-DP " +
        "release, completing the privacy ladder audit->k-anon->" +
        "t-closeness->central-DP->local-DP): each user's sensitive " +
        "bit (purchased?) is reported TRUTHFULLY with p = 3/4 and " +
        "FLIPPED with 1/4 (epsilon = ln 3), the flip coin a " +
        "deterministic Knuth-mix parity so both engines replay the " +
        "identical randomization (q244's no-engine-RNG rule); the " +
        "aggregator then DEBIASES: pi_hat = (obs/n - 1/4)/(1/2) = " +
        "(4*obs - n)/(2n), an exact integer rational. The output row " +
        "carries the ground truth beside the estimate — the " +
        "calibration error a privacy platform monitors to size its " +
        "cohorts. 100 TB: one user-grain aggregate; the mechanism is " +
        "a per-row projection.",
      (s, dir) => {
        import s.implicits._
        val u = Tables.t(s, dir, "events")
          .groupBy($"user_id")
          .agg(max(($"event_type" === "purchase").cast("long"))
            .as("truth"))
          .select($"user_id", $"truth",
            (($"user_id" * 2654435761L + 11L) % 4 === 0)
              .cast("long").as("flip"))
          .withColumn("reported",
            when($"flip" === 1, lit(1L) - $"truth").otherwise($"truth"))
        u.agg(
            count(lit(1)).as("n_users"),
            sum($"truth").as("true_pos"),
            sum($"flip").as("n_flipped"),
            sum($"reported").as("reported_pos"))
          .select($"n_users", $"true_pos", $"n_flipped",
            $"reported_pos",
            expr("(4 * reported_pos - n_users) * 1000000 div " +
              "(2 * n_users)").as("est_pos_ppm"),
            expr("true_pos * 1000000 div n_users").as("true_pos_ppm"))
          .withColumn("abs_err_ppm",
            abs($"est_pos_ppm" - $"true_pos_ppm"))
      },
      Some("""
        WITH u AS (
          SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS truth,
                 CASE WHEN (user_id * 2654435761 + 11) % 4 = 0
                   THEN 1 ELSE 0 END AS flip
          FROM events GROUP BY user_id),
        r AS (
          SELECT truth, flip,
                 CASE WHEN flip = 1 THEN 1 - truth ELSE truth END
                   AS reported
          FROM u),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(truth) AS BIGINT) AS true_pos,
                 CAST(sum(flip) AS BIGINT) AS n_flipped,
                 CAST(sum(reported) AS BIGINT) AS reported_pos
          FROM r)
        SELECT n_users, true_pos, n_flipped, reported_pos,
               CAST((4 * reported_pos - n_users) * 1000000
                 // (2 * n_users) AS BIGINT) AS est_pos_ppm,
               CAST(true_pos * 1000000 // n_users AS BIGINT)
                 AS true_pos_ppm,
               CAST(abs((4 * reported_pos - n_users) * 1000000
                 // (2 * n_users) - true_pos * 1000000 // n_users)
                 AS BIGINT) AS abs_err_ppm
        FROM a""")),

    Q(
      "q380_neyman_allocation",
      "NEYMAN OPTIMAL STRATIFIED-SAMPLE ALLOCATION (Neyman 1934 — " +
        "q107's stratified sampler told WHERE to sample; this computes " +
        "HOW MUCH: n_h proportional to N_h * S_h, the allocation that " +
        "minimizes estimator variance at fixed budget): strata = the " +
        "5 customer regions over order cents, and the Neyman weight " +
        "collapses to ONE exact integer per stratum — N_h*S_h = " +
        "sqrt(N_h * sum(x^2) - sum(x)^2) — so the only non-integer " +
        "step is floor(sqrt) of an exact DECIMAL-internal value " +
        "(IEEE sqrt is correctly rounded, so both engines floor the " +
        "SAME double; everything around it is integer). The 1000-unit " +
        "budget splits by q326's largest-remainder rule (base div, " +
        "remainders ranked, deterministic region tie-break) so " +
        "allocations sum to the budget EXACTLY. Output carries N_h " +
        "and the proportional-allocation column beside Neyman — the " +
        "delta is the variance the optimal split saves. 100 TB: one " +
        "(stratum)-grain aggregate with map-side partials; the " +
        "allocation algebra lives on 5 rows.",
      (s, dir) => {
        import s.implicits._
        val st = Tables.t(s, dir, "orders")
          .join(broadcast(Tables.t(s, dir, "customer")),
            $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .select($"n_regionkey".cast("long").as("region"),
            expr("cast(round(o_totalprice * 100) as bigint)")
              .as("x"))
          .groupBy($"region")
          .agg(count(lit(1)).as("n_h"), sum($"x").as("sx"),
            sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"))
          .select($"region", $"n_h",
            expr("cast(floor(sqrt(cast(n_h * sxx - " +
              "cast(sx as decimal(38,0)) * sx as double))) as bigint)")
              .as("w"))
        val tw = broadcast(st.agg(sum($"w").as("tw"),
          sum($"n_h").as("tn")))
        val wRem = Window.orderBy(
          expr("(w * 1000) % tw").desc, $"region".asc)
        val alloc = st.crossJoin(tw)
          .select($"region", $"n_h", $"w", $"tw", $"tn",
            expr("(w * 1000) div tw").as("base"),
            expr("(n_h * 1000) div tn").as("prop_alloc"))
          .withColumn("rk", row_number().over(wRem))
        alloc
          .crossJoin(broadcast(alloc.agg(
            (lit(1000L) - sum($"base")).as("leftover"))))
          .select($"region", $"n_h", $"w", $"prop_alloc",
            ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
              .as("neyman_alloc"))
          .orderBy($"region")
      },
      Some("""
        WITH st AS (
          SELECT CAST(n.n_regionkey AS BIGINT) AS region,
                 CAST(count(*) AS BIGINT) AS n_h,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sx,
                 sum(CAST(round(o_totalprice * 100) AS HUGEINT)
                   * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx
          FROM orders
          JOIN customer c ON o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1),
        wt AS (
          SELECT region, n_h,
                 CAST(floor(sqrt(CAST(n_h * sxx
                   - CAST(sx AS HUGEINT) * sx AS DOUBLE))) AS BIGINT)
                   AS w
          FROM st),
        t AS (SELECT CAST(sum(w) AS BIGINT) AS tw,
                     CAST(sum(n_h) AS BIGINT) AS tn FROM wt),
        a AS (
          SELECT region, n_h, w, tw, tn,
                 CAST((w * 1000) // tw AS BIGINT) AS base,
                 CAST((w * 1000) % tw AS BIGINT) AS rem,
                 CAST((n_h * 1000) // tn AS BIGINT) AS prop_alloc
          FROM wt CROSS JOIN t),
        r AS (
          SELECT a.*, CAST(row_number() OVER (ORDER BY rem DESC,
            region ASC) AS BIGINT) AS rk FROM a),
        lo AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS leftover
               FROM a)
        SELECT region, n_h, w, prop_alloc,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                 AS BIGINT) AS neyman_alloc
        FROM r CROSS JOIN lo ORDER BY region""")),

    Q(
      "q403_bitemporal_asof",
      "BITEMPORAL AS-OF REPORTING (Snodgrass 1992's two time axes — " +
        "VALID time = when the order happened, TRANSACTION time = " +
        "when the warehouse learned its value; the restatement " +
        "machinery q146's SCD2 tracks on one axis, completed with " +
        "the second): a deterministic correction stream restates " +
        "every 7th order's total 30 days after its order date, and " +
        "the report answers the auditor's question — per valid-time " +
        "year, revenue AS KNOWN AT T1 = 1998-07-01 vs AS KNOWN NOW " +
        "for the SAME orders, the restated-order count, and the " +
        "restatement delta isolated from new-order growth (the two " +
        "silently conflated by any single-axis ledger). Orders " +
        "whose correction lands after T1 show their ORIGINAL value " +
        "in the T1 column — the boundary subtlety bitemporality " +
        "exists for. With two versions the as-of pick is a CASE on " +
        "tx-visibility; the general N-version form is q18's as-of " +
        "join run on the tx axis. Exact integer cents; the " +
        "correction amount (orderkey % 1000 - 500) is arithmetic " +
        "both engines replay. 100 TB: one orders scan, one bounded " +
        "year-domain aggregate — versions add a constant factor, " +
        "never a join.",
      (s, dir) => {
        import s.implicits._
        val t1 = lit("1998-07-01 00:00:00").cast("timestamp")
        Tables.t(s, dir, "orders")
          .select($"o_orderkey", $"o_orderdate",
            expr("cast(round(o_totalprice * 100) as bigint)")
              .as("cents"))
          .withColumn("has_corr", $"o_orderkey" % 7 === 0)
          .withColumn("corr_cents",
            $"cents" + ($"o_orderkey" % 1000) - 500L)
          .withColumn("corr_tx",
            $"o_orderdate" + expr("INTERVAL 30 DAYS"))
          .filter($"o_orderdate" <= t1) // known at T1 (v0 tx = orderdate)
          .select(year($"o_orderdate").cast("long").as("valid_year"),
            when($"has_corr" && $"corr_tx" <= t1, $"corr_cents")
              .otherwise($"cents").as("v_t1"),
            when($"has_corr", $"corr_cents").otherwise($"cents")
              .as("v_now"))
          .groupBy($"valid_year")
          .agg(count(lit(1)).as("n_known_t1"),
            sum($"v_t1").as("rev_asof_t1_cents"),
            sum($"v_now").as("rev_asof_now_cents"),
            sum(($"v_t1" =!= $"v_now").cast("long")).as("n_restated"))
          .withColumn("restatement_cents",
            $"rev_asof_now_cents" - $"rev_asof_t1_cents")
          .orderBy($"valid_year")
      },
      Some("""
        WITH v AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS valid_year,
                 CASE WHEN o_orderkey % 7 = 0
                       AND o_orderdate + INTERVAL 30 DAY
                         <= TIMESTAMP '1998-07-01'
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        + (o_orderkey % 1000) - 500
                      ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                 END AS v_t1,
                 CASE WHEN o_orderkey % 7 = 0
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        + (o_orderkey % 1000) - 500
                      ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                 END AS v_now
          FROM orders
          WHERE o_orderdate <= TIMESTAMP '1998-07-01')
        SELECT valid_year,
               CAST(count(*) AS BIGINT) AS n_known_t1,
               CAST(sum(v_t1) AS BIGINT) AS rev_asof_t1_cents,
               CAST(sum(v_now) AS BIGINT) AS rev_asof_now_cents,
               CAST(sum(CASE WHEN v_t1 <> v_now THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_restated,
               CAST(sum(v_now) - sum(v_t1) AS BIGINT)
                 AS restatement_cents
        FROM v GROUP BY valid_year ORDER BY valid_year""")),

    Q(
      "q409_correlated_sample_join_size",
      "CORRELATED-SAMPLING JOIN-SIZE ESTIMATION (the join-synopses " +
        "idea — Acharya et al. 1999 — in its modern hash-threshold " +
        "form: sample KEYS by a shared hash, not rows independently, " +
        "so matching rows survive on BOTH sides together; q288 " +
        "measured System R's |A|*|B|/max(ndv) uniformity estimate, " +
        "THIS puts the sketch beside it on the edges where " +
        "uniformity lies — SELF-joins on skewed keys, where join " +
        "size is sum f(k)^2 and the popular keys dominate): a key " +
        "enters the 10% synopsis when its portable Knuth-mixer hash " +
        "(q399's) lands below the threshold, the sampled " +
        "sum na*nb scales by 1/p — unbiased under any skew because " +
        "the heavy keys are sampled WITH their full frequency — and " +
        "both estimators' signed errors in bp sit beside the exact " +
        "truth. Plan: per-key count aggregates only (the join is " +
        "never materialized, q288's discipline); the synopsis " +
        "filter is one hash-compare on the bounded count table. " +
        "100 TB: the synopsis is p*|keys| rows however skewed the " +
        "frequencies; System R needs only 4 catalog numbers but " +
        "pays for it below.",
      (s, dir) => {
        import s.implicits._
        def edge(name: String, df: org.apache.spark.sql.DataFrame,
            k: String) = {
          val c = df.groupBy(col(k).as("k"))
            .agg(count(lit(1)).as("n"))
            .withColumn("h",
              (($"k" * 2654435761L + 987654321L) % 2147483647L))
          c.agg(
              sum($"n" * $"n").as("actual_rows"),
              sum($"n").as("r"),
              count(lit(1)).as("d"),
              sum(when($"h" < 214748364L, $"n" * $"n")
                .otherwise(0L)).as("samp"))
            .select(lit(name).as("edge"), $"actual_rows",
              expr("(r * r) div d").as("systemr_est"),
              ($"samp" * 10L).as("sketch_est"))
            .withColumn("systemr_err_bp",
              expr("(case when systemr_est < actual_rows then -1 " +
                "else 1 end) * ((abs(systemr_est - actual_rows) " +
                "* 10000) div actual_rows)"))
            .withColumn("sketch_err_bp",
              expr("(case when sketch_est < actual_rows then -1 " +
                "else 1 end) * ((abs(sketch_est - actual_rows) " +
                "* 10000) div actual_rows)"))
        }
        edge("lineitem_x_lineitem_on_partkey",
            Tables.t(s, dir, "lineitem"), "l_partkey")
          .unionByName(edge("events_x_events_on_user",
            Tables.t(s, dir, "events"), "user_id"))
          .orderBy($"edge")
      },
      Some("""
        WITH c1 AS (
          SELECT l_partkey AS k, CAST(count(*) AS BIGINT) AS n,
                 (l_partkey * 2654435761 + 987654321) % 2147483647 AS h
          FROM lineitem GROUP BY l_partkey),
        e1 AS (
          SELECT 'lineitem_x_lineitem_on_partkey' AS edge,
                 CAST(sum(n * n) AS BIGINT) AS actual_rows,
                 CAST((sum(n) * sum(n)) // count(*) AS BIGINT)
                   AS systemr_est,
                 CAST(sum(CASE WHEN h < 214748364 THEN n * n
                   ELSE 0 END) * 10 AS BIGINT) AS sketch_est
          FROM c1),
        c2 AS (
          SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n,
                 (user_id * 2654435761 + 987654321) % 2147483647 AS h
          FROM events GROUP BY user_id),
        e2 AS (
          SELECT 'events_x_events_on_user' AS edge,
                 CAST(sum(n * n) AS BIGINT) AS actual_rows,
                 CAST((sum(n) * sum(n)) // count(*) AS BIGINT)
                   AS systemr_est,
                 CAST(sum(CASE WHEN h < 214748364 THEN n * n
                   ELSE 0 END) * 10 AS BIGINT) AS sketch_est
          FROM c2),
        u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
        SELECT edge, actual_rows, systemr_est, sketch_est,
               CAST((CASE WHEN systemr_est < actual_rows THEN -1
                 ELSE 1 END) * ((abs(systemr_est - actual_rows)
                 * 10000) // actual_rows) AS BIGINT) AS systemr_err_bp,
               CAST((CASE WHEN sketch_est < actual_rows THEN -1
                 ELSE 1 END) * ((abs(sketch_est - actual_rows)
                 * 10000) // actual_rows) AS BIGINT) AS sketch_err_bp
        FROM u ORDER BY edge""")),

    Q(
      "q452_misra_gries_heavy_hitters",
      "MISRA-GRIES HEAVY HITTERS WITH A DETERMINISTIC CERTIFICATE " +
        "(Misra & Gries 1982; merge soundness per Agarwal et al. " +
        "2013 'Mergeable Summaries') — the deterministic counter " +
        "complement to q264's SpaceSaving stream and the sketch " +
        "family's only member with a ZERO-false-negative guarantee: " +
        "each input partition runs the classic c=4-counter loop " +
        "(arrivals increment a held counter, fill an empty slot, or " +
        "decrement ALL counters — so every item with in-partition " +
        "frequency > n_p/5 provably survives), and because a global " +
        "share > N/6 forces an above-threshold share in at least one " +
        "partition, the UNION of per-partition survivors is a " +
        "certified SUPERSET of the true heavy hitters over the " +
        "leading DIGIT of integer order cents (q238's Benford axis — " +
        "the fixtures' one genuinely skewed categorical: digits 1-4 " +
        "carry ~22% each, 5-9 ~2%, so the answer clears the " +
        "threshold with a >5pp margin on both sides at every SF). " +
        "The exact confirm pass then counts ONLY candidate keys " +
        "(the isin filter runs before the aggregate, so " +
        "non-candidates never reach the shuffle) and keeps those " +
        "with n*6 > N — so the final answer is EXACT and " +
        "partitioning-" +
        "invariant, which is what lets a trained-sketch-free query " +
        "take a bit-exact DuckDB oracle where q134/q264 are " +
        "rows-only. The certificate rides as theorem booleans " +
        "(partitioning-dependent counter values never reach the " +
        "output): every confirmed heavy hitter was a candidate, the " +
        "candidate set is bounded by 5 x input partitions, and the " +
        "summed MG lower bounds straddle the exact counts within " +
        "the summed n_p/6 decrement budget. 100 TB: the MG pass is " +
        "one scan with O(c) state per task and O(c x tasks) driver " +
        "rows — no shuffle, no full-domain groupBy — and the " +
        "confirm pass aggregates a candidate-filtered scan onto a " +
        "<= 5 x tasks key domain; the win over an exact groupBy " +
        "grows with domain cardinality (trillions of keys -> " +
        "dozens of candidates).",
      (s, dir) => {
        import s.implicits._
        val k = 6 // report share > N/6; MG needs k-1 = 5 counters
        val keys = Tables.t(s, dir, "orders")
          .select(substring(expr(
            "cast(round(o_totalprice * 100) as bigint)").cast("string"),
            1, 1).as("grp")).as[String]
        val nParts = keys.rdd.getNumPartitions.toLong
        // per-partition Misra-Gries: c = k-1 counters, emitted as
        // (key, lower_bound) survivor rows — O(c) rows per task
        val surv = keys.mapPartitions { it =>
          val c = k - 1
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          it.foreach { x =>
            m.get(x) match {
              case Some(v) => m.update(x, v + 1)
              case None if m.size < c => m.update(x, 1L)
              case None =>
                m.mapValuesInPlace((_, v) => v - 1)
                m.filterInPlace((_, v) => v > 0)
            }
          }
          m.iterator
        }.toDF("grp", "lb")
        // candidates: bounded by c x partitions — a driver-safe collect
        val cand = surv.groupBy($"grp").agg(sum($"lb").as("cert_lb"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val candKeys = cand.keys.toSeq.sorted
        val candidatesBounded = candKeys.size.toLong <= (k - 1) * nParts
        // exact confirm over the CANDIDATE-filtered scan only
        val n = keys.count()
        val exact = keys.toDF("grp")
          .where($"grp".isin(candKeys: _*))
          .groupBy($"grp").agg(count(lit(1)).as("n_exact"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val hh = exact.filter { case (_, ne) => ne * k > n }.toSeq.sorted
        // theorem certificates: every HH surfaced as a candidate (by
        // construction here, but asserted against the EXACT pass), and
        // each candidate's summed MG lower bound undercounts its true
        // frequency by at most the summed per-partition decrement
        // budget n_p/(c+1) <= N/k
        val allHhWereCandidates = hh.forall(h => cand.contains(h._1))
        val boundHolds = candKeys.forall { g =>
          val lb = cand(g); val ne = exact(g)
          lb <= ne && (ne - lb) * k <= n
        }
        hh.map { case (g, ne) =>
          (g, ne, n, candidatesBounded, allHhWereCandidates, boundHolds)
        }.toDF("grp", "n_exact", "n_total",
            "candidates_bounded_by_counters_x_partitions",
            "all_heavy_hitters_were_candidates",
            "mg_undercount_within_decrement_budget")
          .orderBy($"grp")
      },
      Some("""
        WITH g AS (
          SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                   AS VARCHAR), 1, 1) AS grp,
                 CAST(count(*) AS BIGINT) AS n_exact
          FROM orders GROUP BY 1),
        t AS (SELECT CAST(sum(n_exact) AS BIGINT) AS n_total FROM g)
        SELECT grp, n_exact, n_total,
               true AS candidates_bounded_by_counters_x_partitions,
               true AS all_heavy_hitters_were_candidates,
               true AS mg_undercount_within_decrement_budget
        FROM g, t WHERE n_exact * 6 > n_total
        ORDER BY grp"""))
  )

  /** Integer fixed-point PageRank over the symmetrized supplier↔customer
    * interaction graph — q150's iterative kernel, factored out so the
    * iteration count and lineage-truncation mode are caller knobs.
    * Per iteration: one slim (node, rank) join against the degree-
    * annotated edge list + one aggregate; every op is integer on a 1e6
    * scale, so the result is bit-identical on any engine, partitioning,
    * or summation order. The edge list feeds degree, node set, AND every
    * iteration's contribution join — materialized ONCE or the fact⋈dim
    * distinct recomputes per consumer (measured at 10x: 36 s → 7 s).
    * Output: (node, rank_scaled), unordered.
    *
    * @param reliable lineage truncation for the edge list and each
    *   iteration's rank frame, mirroring [[Dedup.neardupClusters]]:
    *   `false` (default) — eager `localCheckpoint`, blocks live on
    *   executors, fastest, right for local mode; on a real cluster an
    *   executor loss mid-chain kills the job (truncated lineage cannot
    *   recompute lost blocks). `true` — eager persist-then-reliable-
    *   `checkpoint()` to the SparkContext checkpoint dir (required — loud
    *   error otherwise): the right switch for a 20-iteration chain on a
    *   1000-executor cluster, where one lost executor must not restart
    *   the whole crawl-weighting job. The persist-first dance avoids the
    *   double computation an unpersisted reliable checkpoint pays (eager
    *   count + checkpoint-RDD write). Superseded per-iteration files are
    *   reclaimed by the context cleaner
    *   (`spark.cleaner.referenceTracking.cleanCheckpoints=true`) or by
    *   clearing the dir after the job — worst case O(iterations) slim
    *   (node, rank) dumps. */
  def pagerankInt(s: SparkSession, dir: String, iterations: Int = 2,
      reliable: Boolean = false): DataFrame = {
    import s.implicits._
    require(iterations >= 1, s"iterations must be >= 1 (got $iterations)")
    if (reliable) require(s.sparkContext.getCheckpointDir.isDefined,
      "pagerankInt(reliable = true) needs spark.sparkContext.setCheckpointDir " +
        "(a fault-tolerant FS path) before the call")
    def snap(df: DataFrame): DataFrame =
      if (reliable) {
        val p = df.persist()
        val ck = p.checkpoint(true)
        p.unpersist()
        ck
      } else df.localCheckpoint(true)
    val e0 = Tables.t(s, dir, "lineitem")
      .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .select(concat(lit("S"), $"l_suppkey").as("src"),
        concat(lit("C"), $"o_custkey").as("dst"))
      .distinct()
    val e = snap(e0.union(e0.select($"dst".as("src"), $"src".as("dst"))))
    // loop INVARIANTS materialized once (deg/nodes/eDeg used to replan
    // and reshuffle from e on every iteration), and the rank vector
    // BROADCASTS into each step: the node domain here is the supplier +
    // customer dims — bounded by construction — so an iteration costs
    // exactly ONE exchange (the dst-grain contribution aggregate); a
    // general web-scale graph would keep the shuffle-join form instead
    val deg = e.groupBy($"src").agg(count(lit(1)).as("d"))
    val nodes = snap(e.select($"src".as("node")).distinct())
    val eDeg = snap(e.join(deg, Seq("src")))
    def step(r: DataFrame): DataFrame = {
      val s2 = eDeg
        .join(broadcast(r.withColumnRenamed("node", "src")), Seq("src"))
        .select($"dst".as("node"), expr("r DIV d").as("c"))
        .groupBy($"node").agg(sum($"c").as("s"))
      nodes.join(broadcast(s2), Seq("node"), "left")
        .select($"node",
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) DIV 100")).as("r"))
    }
    var r = nodes.select($"node", lit(1000000L).as("r"))
    // snap each pass: the plan stays one-iteration deep no matter how
    // many iterations run (unsnapped, iteration k replans k joins deep)
    for (_ <- 1 to iterations) r = snap(step(r))
    r.select($"node", $"r".cast("long").as("rank_scaled"))
  }
}
