package graft.functions

import graft.catalyst.TextHash
import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extension, SURVEY.md §2B): language-ID heuristic, quality scoring,
  * token counting (whitespace + BPE-ish regex), document fingerprinting.
  *
  * Everything except the fingerprints is pure `functions._` composition
  * (codegen'd, oracle-checkable in DuckDB); the fingerprints are native
  * Catalyst expressions (graft.catalyst.TextHash) since a byte-level
  * rolling hash has no built-in equivalent.
  *
  * Scale notes (100 TB): all per-document — embarrassingly parallel map
  * over the scan, no shuffle at all until the final (tiny) aggregate or
  * sort. This is the shape that saturates a 1000-executor cluster.
  */
object TextAnalysis extends QueryModule {

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "y"),
    "fr" -> Seq("le", "les", "une", "et", "est"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4"))

  private def toks: Column = split(trim(col("text")), " ")

  /** #tokens (as double) present in `words`. */
  private def hits(words: Seq[String]): Column =
    size(filter(toks, x => array_contains(typedLit(words), x))).cast("double")

  private def duckHits(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter(string_split(trim(text), ' '), x -> list_contains($lst, x))) AS DOUBLE)"
  }

  override def queries: Seq[Q] = Seq(
    Q(
      "q50_token_stats",
      "Tokenization statistics per document: whitespace tokens, unique " +
        "tokens, type-token ratio, mean token length.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select($"doc_id", toks.as("t"), length(trim($"text")).cast("double").as("len"))
          .select(
            $"doc_id",
            size($"t").as("n_tokens"),
            size(array_distinct($"t")).as("n_unique"),
            round(size(array_distinct($"t")).cast("double") / size($"t"), 4).as("ttr"),
            round(($"len" - (size($"t") - 1)) / size($"t"), 4).as("avg_tok_len"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(t) AS INTEGER)                                    AS n_tokens,
               CAST(len(list_distinct(t)) AS INTEGER)                     AS n_unique,
               round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 4)   AS ttr,
               round((length(trim(text)) - (len(t) - 1.0)) / len(t), 4)   AS avg_tok_len
        FROM (SELECT doc_id, text, string_split(trim(text), ' ') AS t FROM documents)
        ORDER BY doc_id""")),

    Q(
      "q51_lang_id",
      "Language-ID heuristic: per-language stopword-hit ratio, argmax with " +
        "fixed priority order (en>de>es>fr>zh), 'und' when no list hits. " +
        "The per-language scores are emitted so the decision is auditable.",
      (s, dir) => {
        import s.implicits._
        val scored = Tables.t(s, dir, "documents")
          .select(
            $"doc_id", $"lang".as("labeled_lang"),
            (hits(stopwords(0)._2) / size(toks)).as("s_en"),
            (hits(stopwords(1)._2) / size(toks)).as("s_de"),
            (hits(stopwords(2)._2) / size(toks)).as("s_es"),
            (hits(stopwords(3)._2) / size(toks)).as("s_fr"),
            (hits(stopwords(4)._2) / size(toks)).as("s_zh"))
        scored.select(
            $"doc_id", $"labeled_lang",
            round($"s_en", 4).as("score_en"),
            when(greatest($"s_en", $"s_de", $"s_es", $"s_fr", $"s_zh") === 0.0, "und")
              .when($"s_en" >= greatest($"s_de", $"s_es", $"s_fr", $"s_zh"), "en")
              .when($"s_de" >= greatest($"s_es", $"s_fr", $"s_zh"), "de")
              .when($"s_es" >= greatest($"s_fr", $"s_zh"), "es")
              .when($"s_fr" >= $"s_zh", "fr")
              .otherwise("zh").as("predicted_lang"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH scored AS (
          SELECT doc_id, lang AS labeled_lang,
                 ${duckHits(stopwords(0)._2)} / len(string_split(trim(text), ' ')) AS s_en,
                 ${duckHits(stopwords(1)._2)} / len(string_split(trim(text), ' ')) AS s_de,
                 ${duckHits(stopwords(2)._2)} / len(string_split(trim(text), ' ')) AS s_es,
                 ${duckHits(stopwords(3)._2)} / len(string_split(trim(text), ' ')) AS s_fr,
                 ${duckHits(stopwords(4)._2)} / len(string_split(trim(text), ' ')) AS s_zh
          FROM documents)
        SELECT doc_id, labeled_lang, round(s_en, 4) AS score_en,
               CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0.0 THEN 'und'
                    WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
                    WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
                    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
                    WHEN s_fr >= s_zh THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
        FROM scored
        ORDER BY doc_id""")),

    Q(
      "q52_quality_score",
      "Document quality scoring: length score, type-token ratio, stopword " +
        "ratio, composite 0-1 score — the filter stage of a training-data " +
        "pipeline (kept as a scored projection so downstream thresholds " +
        "stay tunable).",
      (s, dir) => {
        import s.implicits._
        val en = stopwords.head._2
        Tables.t(s, dir, "documents")
          .select(
            $"doc_id",
            least(size(toks).cast("double") / 20.0, lit(1.0)).as("len_score"),
            (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"),
            (hits(en) / size(toks)).as("stop_ratio"))
          .select(
            $"doc_id",
            round($"len_score", 4).as("len_score"),
            round($"ttr", 4).as("ttr"),
            round($"stop_ratio", 4).as("stop_ratio"),
            round($"len_score" * 0.4 + $"ttr" * 0.4 + (lit(1.0) - $"stop_ratio") * 0.2, 4)
              .as("quality"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id,
                 least(len(string_split(trim(text), ' ')) / 20.0, 1.0) AS len_score,
                 CAST(len(list_distinct(string_split(trim(text), ' '))) AS DOUBLE)
                   / len(string_split(trim(text), ' ')) AS ttr,
                 ${duckHits(stopwords.head._2)} / len(string_split(trim(text), ' ')) AS stop_ratio
          FROM documents)
        SELECT doc_id, round(len_score, 4) AS len_score, round(ttr, 4) AS ttr,
               round(stop_ratio, 4) AS stop_ratio,
               round(len_score * 0.4 + ttr * 0.4 + (1.0 - stop_ratio) * 0.2, 4) AS quality
        FROM f
        ORDER BY doc_id""")),

    Q(
      "q53_token_count",
      "Token counting: whitespace count, BPE-ish regex segment count " +
        "(letter runs / digit runs / single punctuation), and the chars/4 " +
        "token estimate used for budget accounting.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(
            $"doc_id",
            size(toks).as("n_ws_tokens"),
            size(regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
              .as("n_bpeish_tokens"),
            ceil($"n_chars".cast("double") / 4.0).as("est_tokens_chars4"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(len(string_split(trim(text), ' ')) AS INTEGER) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                    AS INTEGER)                                    AS n_bpeish_tokens,
               CAST(ceil(n_chars / 4.0) AS BIGINT)                 AS est_tokens_chars4
        FROM documents
        ORDER BY doc_id""")),

    Q(
      "q57_tfidf",
      "TF-IDF: token frequencies per doc × inverse document frequency " +
        "(two aggregations over the exploded token index), then the top " +
        "characteristic token per document. Ranking uses the 6-dp-rounded " +
        "score + token tiebreak so it is engine-independent.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
        val nDocs = docs.count().toDouble
        val tok = docs.select($"doc_id", explode(split(trim($"text"), " ")).as("token"))
        val tf = tok.groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
        val df = tok.select($"doc_id", $"token").distinct()
          .groupBy($"token").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"token")
        tf.join(df, Seq("token"))
          .withColumn("tfidf",
            round($"tf" * log((lit(nDocs) + 1.0) / ($"df" + 1.0)), 6))
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"doc_id", $"token".as("top_token"), $"tfidf")
          .orderBy($"doc_id")
      },
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT doc_id, token,
                 round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
          FROM tf JOIN df USING (token) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, token, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, token) AS rn
          FROM scored)
        SELECT doc_id, token AS top_token, tfidf FROM ranked WHERE rn = 1
        ORDER BY doc_id""")),

    Q(
      "q58_text_normalize",
      "Normalization pipeline stage: lowercase → strip non-alphanumerics " +
        "→ squish whitespace → drop stopwords → re-join; emits before/" +
        "after token counts — the cleaning pass ahead of dedup/training.",
      (s, dir) => {
        import s.implicits._
        val stop = typedLit(stopwords.head._2)
        Tables.t(s, dir, "documents")
          .select($"doc_id",
            split(trim(regexp_replace(regexp_replace(lower($"text"),
              "[^a-z0-9 ]", " "), " +", " ")), " ").as("t"))
          .select($"doc_id",
            size($"t").as("n_before"),
            filter($"t", x => !array_contains(stop, x)).as("kept"))
          .select($"doc_id", $"n_before",
            size($"kept").as("n_after"),
            array_join($"kept", " ").as("clean_text"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
          FROM documents),
        k AS (
          SELECT doc_id, len(t) AS n_before,
                 list_filter(t, x -> NOT list_contains(${stopwords.head._2
                   .map(w => s"'$w'").mkString("[", ", ", "]")}, x)) AS kept
          FROM t)
        SELECT doc_id, CAST(n_before AS INTEGER) AS n_before,
               CAST(len(kept) AS INTEGER) AS n_after,
               array_to_string(kept, ' ') AS clean_text
        FROM k
        ORDER BY doc_id""")),

    Q(
      "q54_fingerprint",
      "Document fingerprinting via the native RollingHash Catalyst " +
        "expression (doGenCode — a one-pass byte loop inside whole-stage " +
        "codegen): polynomial hash of the UTF-8 bytes, base 263 modulo " +
        "the Mersenne prime 2^61-1. PROMOTED to a bit-exact oracle in " +
        "round 9: the recurrence h = (h*263 + byte) mod (2^61-1) is pure " +
        "integer arithmetic, so DuckDB replays it exactly with a HUGEINT " +
        "list_reduce over the character codes (texts are pure ASCII — " +
        "FixtureContractSpec pins char==byte, making ascii(c) the byte). " +
        "The companion SimHash expression stays exercised by q64's " +
        "banding and TextHashSpec's golden values (XXH64 token hashing " +
        "is not DuckDB-expressible).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(
            $"doc_id",
            TextHash.rolling_hash($"text").as("fingerprint"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(list_reduce(
                 list_prepend(CAST(0 AS HUGEINT),
                   [CAST(ascii(c) AS HUGEINT) for c in string_split(text, '')]),
                 (h, b) -> (h * 263 + b) % 2305843009213693951) AS BIGINT)
                 AS fingerprint
        FROM documents
        ORDER BY doc_id""")),

    Q(
      "q105_ngram_topk",
      "Corpus n-gram statistics: explode word bigrams per document, count " +
        "per (lang, bigram), keep each language's top-5 by count (bigram " +
        "as the deterministic tie-break). The generate is per-document " +
        "map-side work; the count shuffles (lang, bigram, partial) — " +
        "map-side combine collapses the Zipf head before the wire — and " +
        "the top-k window runs per-lang on already-reduced counts. The " +
        "100 TB form of vocabulary mining.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        Tables.t(s, dir, "documents")
          .select($"lang", split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
          .select($"lang", explode(expr(
            "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
            .as("bigram"))
          .groupBy($"lang", $"bigram")
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(
            Window.partitionBy($"lang").orderBy($"n".desc, $"bigram")))
          .filter($"rk" <= 5)
          .orderBy($"lang", $"rk")
      },
      Some("""
        WITH w AS (SELECT lang, string_split(text, ' ') AS ws FROM documents
                   WHERE len(string_split(text, ' ')) >= 2),
             b AS (SELECT lang,
                          unnest([ws[i] || ' ' || ws[i + 1]
                                  for i in range(1, len(ws))]) AS bigram
                   FROM w),
             c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY 1, 2),
             r AS (SELECT lang, bigram, n,
                          row_number() OVER (PARTITION BY lang
                                             ORDER BY n DESC, bigram) AS rk
                   FROM c)
        SELECT lang, bigram, n, CAST(rk AS INTEGER) AS rk
        FROM r WHERE rk <= 5
        ORDER BY lang, rk""")),

    Q(
      "q106_pii_redact",
      "PII redaction: synthesize email/phone columns from customer fields " +
        "(the fixtures carry no real PII), then mask them — regexp_replace " +
        "for the email local part (RE2-safe pattern, so the same regex " +
        "runs on any engine) and length-preserving star-fill keeping the " +
        "last 4 phone digits. Pure per-row projection: zero shuffle, " +
        "whole-stage codegen, linear scan at any scale.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "customer")
          .select($"c_custkey",
            concat(lower(regexp_replace($"c_name", "#", ".")),
              lit("@example.com")).as("email"),
            concat(lit("555-"),
              lpad(($"c_custkey" % 10000000L).cast("string"), 7, "0")).as("phone"))
          .select($"c_custkey",
            regexp_replace($"email", "^[a-z0-9.]+@", "redacted@").as("email_redacted"),
            concat(expr("repeat('*', length(phone) - 4)"),
              substring($"phone", -4, 4)).as("phone_redacted"))
          .orderBy($"c_custkey")
      },
      Some("""
        WITH p AS (SELECT c_custkey,
                          lower(replace(c_name, '#', '.')) || '@example.com' AS email,
                          '555-' || lpad(CAST(c_custkey % 10000000 AS VARCHAR), 7, '0') AS phone
                   FROM customer)
        SELECT c_custkey,
               regexp_replace(email, '^[a-z0-9.]+@', 'redacted@') AS email_redacted,
               repeat('*', length(phone) - 4) || right(phone, 4)  AS phone_redacted
        FROM p
        ORDER BY c_custkey""")),

    Q(
      "q121_repetition_stats",
      "Gopher-style within-document repetition filter: the fraction of " +
        "duplicate token bigrams per doc (1 - distinct/total), the " +
        "signal used to drop boilerplate/spam before training. Bigrams " +
        "via zip_with over two slices of the token array — the lambda " +
        "only touches slice OUTPUTS, so the tokenizer runs a constant " +
        "~3x per row (each column reference), never per element (the " +
        "CollapseProject per-element re-evaluation trap hits lambdas " +
        "that reference the tokens column directly). Ratio is " +
        "floor-truncated at 4 dp (IEEE-deterministic on both engines). " +
        "Pure per-row projection: zero shuffle, linear at any scale.",
      (s, dir) => {
        import s.implicits._
        val t = filter(split(trim($"text"), " "), x => x =!= lit(""))
        // slice length must be >= 0: an empty or 1-token doc would pass
        // -1/0 and error; greatest(,0) degrades it to an empty slice
        val len = greatest(size(t) - 1, lit(0))
        Tables.t(s, dir, "documents")
          .select($"doc_id",
            zip_with(slice(t, lit(1), len), slice(t, lit(2), len),
              (a, b) => concat(a, lit("\u001f"), b)).as("bi"))
          .filter(size($"bi") > 0)
          .select($"doc_id",
            size($"bi").as("n_bigrams"),
            size(array_distinct($"bi")).as("n_distinct"))
          .withColumn("dup_frac",
            floor(($"n_bigrams" - $"n_distinct") * 10000.0 / $"n_bigrams") / 10000.0)
          .orderBy($"doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
          FROM documents),
        bi AS (
          SELECT doc_id, [t[i] || chr(31) || t[i+1] for i in range(1, len(t))] AS b
          FROM toks
          WHERE len(t) >= 2)
        SELECT doc_id,
               CAST(len(b) AS INTEGER)                AS n_bigrams,
               CAST(len(list_distinct(b)) AS INTEGER) AS n_distinct,
               floor((len(b) - len(list_distinct(b))) * 10000.0 / len(b)) / 10000.0
                 AS dup_frac
        FROM bi
        ORDER BY doc_id""")),

    Q(
      "q127_bigram_rarity",
      "CCNet-style LM-rarity quality signal, in exact INTEGER arithmetic " +
        "(a float LM surprisal would hinge on cross-engine ln() ULPs): " +
        "per document, how common its word bigrams are in the whole " +
        "corpus — total bigrams, rare bigrams (corpus df <= 2, the " +
        "gibberish/typo signal), and the floor-truncated mean corpus df " +
        "(boilerplate scores high). Two shuffles that both scale: the " +
        "corpus df aggregate collapses the Zipf head map-side before " +
        "the wire, and the df join keys on the bigram hash — the Zipf " +
        "hot keys are exactly what AQE skew-join splits at 100 TB. The " +
        "per-doc re-aggregate keys on doc_id (never skewed).",
      (s, dir) => {
        import s.implicits._
        val docBigrams = Tables.t(s, dir, "documents")
          .select($"doc_id", split($"text", " ").as("w"))
          .filter(size($"w") >= 2)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
            .as("bigram"))
        val df = docBigrams.groupBy($"bigram").agg(count(lit(1)).as("n"))
        docBigrams.join(df, Seq("bigram"))
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n_bigrams"),
            sum(when($"n" <= 2, 1L).otherwise(0L)).as("n_rare"),
            (floor(sum($"n") * 10000.0 / count(lit(1))) / 10000.0).as("avg_df"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                   WHERE len(string_split(text, ' ')) >= 2),
        b AS (SELECT doc_id,
                     unnest([ws[i] || ' ' || ws[i + 1]
                             for i in range(1, len(ws))]) AS bigram
              FROM w),
        df AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram)
        SELECT doc_id,
               count(*) AS n_bigrams,
               CAST(sum(CASE WHEN n <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
               floor(sum(n) * 10000.0 / count(*)) / 10000.0 AS avg_df
        FROM b JOIN df USING (bigram)
        GROUP BY doc_id
        ORDER BY doc_id""")),

    Q(
      "q129_quality_funnel",
      "The FILTER FUNNEL that ends a quality pipeline: every document " +
        "gets a keep/drop verdict with first-match reason attribution " +
        "(too_short n<10 → repetitive bigram-dup>0.2 → low_ttr<0.3 → " +
        "kept), composed from the same signal kernels as q50/q121, and " +
        "the audit reports per-(lang, verdict) counts + mean length — " +
        "the reason breakdown a pipeline owner actually reads before " +
        "shipping a corpus. All signals are exact integer ratios " +
        "(IEEE-identical across engines), guarded against empty-token " +
        "divide-by-zero on both sides. Pure per-row projection + one " +
        "audit aggregate: zero extra shuffles, linear at any scale.",
      (s, dir) => {
        import s.implicits._
        val t = filter(split(trim($"text"), " "), x => x =!= lit(""))
        val len = greatest(size(t) - 1, lit(0))
        val scored = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang",
            size(t).as("n_tok"),
            size(array_distinct(t)).as("n_uniq"),
            zip_with(slice(t, lit(1), len), slice(t, lit(2), len),
              (a, b) => concat(a, lit("\u001f"), b)).as("bi"))
          .select($"doc_id", $"lang", $"n_tok",
            when($"n_tok" === 0, 0.0)
              .otherwise($"n_uniq".cast("double") / $"n_tok").as("ttr"),
            when(size($"bi") === 0, 0.0)
              .otherwise((size($"bi") - size(array_distinct($"bi")))
                .cast("double") / size($"bi")).as("dup_frac"))
        scored
          .withColumn("verdict",
            when($"n_tok" < 10, "too_short")
              .when($"dup_frac" > 0.2, "repetitive")
              .when($"ttr" < 0.3, "low_ttr")
              .otherwise("kept"))
          .groupBy($"lang", $"verdict")
          .agg(count(lit(1)).as("n_docs"),
            (floor(sum($"n_tok") * 10000.0 / count(lit(1))) / 10000.0)
              .as("avg_tokens"))
          .orderBy($"lang", $"verdict")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, lang,
                 list_filter(string_split(trim(text), ' '), x -> x <> '') AS t
          FROM documents),
        sig AS (
          SELECT doc_id, lang, len(t) AS n_tok,
                 CASE WHEN len(t) = 0 THEN 0.0
                      ELSE CAST(len(list_distinct(t)) AS DOUBLE) / len(t) END AS ttr,
                 CASE WHEN len(t) < 2 THEN 0.0
                      ELSE CAST(len(b) - len(list_distinct(b)) AS DOUBLE) / len(b)
                      END AS dup_frac
          FROM (SELECT doc_id, lang, t,
                       [t[i] || chr(31) || t[i+1] for i in range(1, len(t))] AS b
                FROM toks)),
        v AS (
          SELECT lang, n_tok,
                 CASE WHEN n_tok < 10 THEN 'too_short'
                      WHEN dup_frac > 0.2 THEN 'repetitive'
                      WHEN ttr < 0.3 THEN 'low_ttr'
                      ELSE 'kept' END AS verdict
          FROM sig)
        SELECT lang, verdict, count(*) AS n_docs,
               floor(sum(n_tok) * 10000.0 / count(*)) / 10000.0 AS avg_tokens
        FROM v
        GROUP BY lang, verdict
        ORDER BY lang, verdict""")),

    Q(
      "q136_source_drift",
      "Distribution DRIFT per source — the data-quality monitor that " +
        "catches a crawler or feed going off the rails: each source's " +
        "token distribution is compared to the whole corpus over the " +
        "global top-20 tokens, using the CROSS-MULTIPLIED integer L1 " +
        "distance sum(|m_i*N - n_i*M_s|) — algebraically the L1 gap of " +
        "the frequency ratios scaled by N*M_s, but computed entirely in " +
        "BIGINT, so the score is exact and engine-identical (a float " +
        "KL-divergence would hinge on cross-engine ln ULPs — same " +
        "dodge as q127). Shuffles: one token count (Zipf head collapses " +
        "map-side), one 20x20-row broadcast-scale compare. At corpora " +
        "where counts approach 2^31, pre-normalize counts to per-" +
        "million before the cross-multiply to keep products in range.",
      (s, dir) => {
        import s.implicits._
        val tok = Tables.t(s, dir, "documents")
          .select($"source", explode(split(trim($"text"), " ")).as("w"))
          .filter($"w" =!= "")
        val counts = tok.groupBy($"source", $"w").agg(count(lit(1)).as("m"))
        val corpus = counts.groupBy($"w").agg(sum($"m").as("n"))
        val top = corpus.orderBy($"n".desc, $"w").limit(20)
        val totS = counts.groupBy($"source").agg(sum($"m").as("ms"))
        val bigN = tok.count()
        totS.crossJoin(broadcast(top))
          .join(counts, Seq("source", "w"), "left")
          .withColumn("m", coalesce($"m", lit(0L)))
          .groupBy($"source")
          .agg(max($"ms").as("n_tokens"),
            sum(abs($"m" * bigN - $"n" * $"ms")).as("drift"))
          .orderBy($"source")
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(list_filter(string_split(trim(text), ' '),
                                            x -> x <> '')) AS w
          FROM documents),
        counts AS (SELECT source, w, count(*) AS m FROM tok GROUP BY 1, 2),
        corpus AS (SELECT w, sum(m) AS n FROM counts GROUP BY w),
        top AS (SELECT w, n FROM corpus ORDER BY n DESC, w LIMIT 20),
        tots AS (SELECT source, sum(m) AS ms FROM counts GROUP BY source),
        big AS (SELECT count(*) AS bn FROM tok)
        SELECT s.source,
               CAST(max(s.ms) AS BIGINT) AS n_tokens,
               CAST(sum(abs(coalesce(c.m, 0) * big.bn - top.n * s.ms)) AS BIGINT)
                 AS drift
        FROM tots s CROSS JOIN top CROSS JOIN big
        LEFT JOIN counts c ON c.source = s.source AND c.w = top.w
        GROUP BY s.source
        ORDER BY s.source""")),

    Q(
      "q141_bpe_pair_stats",
      "One BPE merge iteration's COUNTING KERNEL: corpus-wide counts of " +
        "adjacent symbol pairs (character bigrams inside whitespace " +
        "words), top-20 by count with lexical tie-break — the aggregate " +
        "a distributed BPE vocabulary trainer runs once per merge to " +
        "pick the next pair. The full driver loop is IMPLEMENTED as " +
        "bpeTrain (apply winning merge via the bpeApplyMerge fold, " +
        "localCheckpoint, re-run this kernel) and BpeSpec verifies 3 " +
        "iterations against an independent index-scan reference plus " +
        "plan flatness across iterations. Generate is per-row " +
        "map-side work; the count shuffles (pair, partial) with map-side " +
        "combine collapsing the tiny symbol-pair domain before the wire " +
        "— at 100 TB the shuffle carries at most |alphabet|^2 keys per " +
        "task, not the corpus. The top-k is a driver-side sort of that " +
        "same tiny domain.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(explode(split(trim($"text"), " ")).as("word"))
          .filter(length($"word") >= 2)
          .select(explode(expr(
            "transform(sequence(1, length(word) - 1), j -> substring(word, j, 2))"))
            .as("pair"))
          .groupBy($"pair").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"pair")
          .limit(20)
      },
      Some("""
        WITH wd AS (SELECT unnest(string_split(trim(text), ' ')) AS word
                    FROM documents),
        p AS (SELECT unnest([substr(word, j, 2) for j in range(1, len(word))]) AS pair
              FROM wd WHERE len(word) >= 2)
        SELECT pair, count(*) AS n FROM p GROUP BY pair
        ORDER BY n DESC, pair LIMIT 20""")),

    Q(
      "q148_boolean_retrieval",
      "BOOLEAN RETRIEVAL (conjunctive): documents containing ALL of " +
        "{query, window, scan} via posting-list intersection — the " +
        "search-side complement of the dedup inverted index, and the " +
        "access pattern a RAG corpus serves. The term filter lands " +
        "BEFORE the explode output shuffles (only candidate postings " +
        "travel), the AND is a count-distinct-equals-k aggregate on " +
        "(doc, term) — no self-join per term pair — and the final " +
        "metadata join is keyed on doc_id. At 100 TB the postings are a " +
        "PRECOMPUTED term-bucketed table and this same plan starts from " +
        "its scan instead of the explode.",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
        val terms = Seq("query", "window", "scan")
        val hits = docs
          .select($"doc_id", explode(array_distinct(split(trim($"text"), " "))).as("w"))
          .filter($"w".isin(terms: _*))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_terms"))
          .filter($"n_terms" === terms.size)
        hits.join(docs, Seq("doc_id"))
          .select($"doc_id", $"source", $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""
        WITH tok AS (SELECT doc_id,
                            unnest(list_distinct(string_split(trim(text), ' '))) AS w
                     FROM documents),
        hits AS (SELECT doc_id FROM tok
                 WHERE w IN ('query', 'window', 'scan')
                 GROUP BY doc_id HAVING count(*) = 3)
        SELECT d.doc_id, d.source, d.n_chars
        FROM hits JOIN documents d USING (doc_id)
        ORDER BY d.doc_id""")),

    Q(
      "q149_phrase_search",
      "PHRASE SEARCH via positional postings: occurrences of the exact " +
        "token phrase 'sort merge' found by joining the two terms' " +
        "(doc_id, position) postings on position adjacency — how a " +
        "search engine answers phrase queries without re-scanning text. " +
        "Each posting row is (doc_id, int); the adjacency join is equi " +
        "on (doc_id, pos) after shifting the second term — slim keys, " +
        "no LIKE scan, no regex. At 100 TB the positional postings are " +
        "a precomputed table bucketed by term; the join shape is " +
        "unchanged.",
      (s, dir) => {
        import s.implicits._
        val toks = Tables.t(s, dir, "documents")
          .select($"doc_id", posexplode(split(trim($"text"), " ")).as(Seq("pos", "w")))
        val t1 = toks.filter($"w" === "sort").select($"doc_id", $"pos")
        val t2 = toks.filter($"w" === "merge").select($"doc_id", ($"pos" - 1).as("pos"))
        t1.join(t2, Seq("doc_id", "pos"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_hits"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH w AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
        h AS (SELECT doc_id,
                     len([1 for i in range(1, len(t))
                          if t[i] = 'sort' AND t[i+1] = 'merge']) AS n_hits
              FROM w)
        SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
        FROM h WHERE n_hits > 0
        ORDER BY doc_id""")),

    Q(
      "q165_bm25_topk",
      "RANKED RETRIEVAL — BM25 top-15 for the query {query, window, " +
        "scan}, completing the retrieval trio (q148 boolean, q149 " +
        "phrase): tf from the token postings, per-term BM25 with " +
        "k1=1.2, b=0.75 and the RATIONAL idf (N-df+0.5)/(df+0.5) — the " +
        "log dropped, a monotone transform that preserves ranking while " +
        "keeping every operation a correctly-rounded IEEE mul/div on " +
        "integer-derived doubles (ln is implementation-defined across " +
        "engines; nothing else here is). Each per-term score lands as " +
        "floor(s*1e6 + 0.5) micros and the per-doc total is an INTEGER " +
        "sum — order-independent, so the score is bit-identical on any " +
        "partitioning and engine. Shuffles: the tf/len aggregates on " +
        "doc_id and a 3-row idf broadcast; corpus stats are a 1-row " +
        "broadcast, never a driver count. At 100 TB tf/len come from " +
        "the same precomputed term-bucketed postings as q148/q149.",
      (s, dir) => {
        import s.implicits._
        bm25Scores(s, dir, Seq("query", "window", "scan"))
          .orderBy($"bm25_micros".desc, $"doc_id")
          .limit(15)
      },
      Some("""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(trim(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        lens AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
        corpus AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len
                   FROM lens),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
               WHERE w IN ('query', 'window', 'scan') GROUP BY 1, 2),
        idf AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        t AS (SELECT tf.doc_id, tf.tf, lens.len, idf.df, c.n_docs,
                     CAST(c.sum_len AS DOUBLE) / c.n_docs AS avgdl
              FROM tf JOIN lens USING (doc_id) JOIN idf USING (w)
              CROSS JOIN corpus c),
        s AS (SELECT doc_id,
                     CAST(floor(((((n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2))
                            / (tf + 1.2 * (0.25 + 0.75 * (len / avgdl))))
                          * 1000000.0 + 0.5) AS BIGINT) AS sc
              FROM t)
        SELECT doc_id, CAST(sum(sc) AS BIGINT) AS bm25_micros,
               count(*) AS n_terms
        FROM s GROUP BY doc_id
        ORDER BY bm25_micros DESC, doc_id
        LIMIT 15""")),

    Q(
      "q179_vocab_oov",
      "TOKENIZER VOCABULARY COVERAGE AUDIT: take the top-100 corpus " +
        "tokens by frequency (count desc, token asc — a UNIQUE total " +
        "order, so the vocabulary is deterministic) as the 'tokenizer " +
        "vocab', then report per language how many token OCCURRENCES " +
        "fall outside it — the out-of-vocabulary rate that decides " +
        "whether a tokenizer (or a frequency-truncated embedding table) " +
        "fits a corpus before a training run. Scale: the frequency " +
        "aggregate collapses the Zipf head map-side; top-k is " +
        "TakeOrderedAndProject (distributed heap, never a global sort " +
        "or a single-partition window); the vocab is k rows → " +
        "broadcast, so the coverage pass is one scan with a map-side " +
        "hash probe and a 5-group aggregate. OOV fraction is " +
        "floor-truncated at 4 dp (IEEE-deterministic).",
      (s, dir) => {
        import s.implicits._
        val toks = Tables.t(s, dir, "documents")
          .select($"lang",
            explode(filter(split(trim($"text"), " "), x => x =!= lit("")))
              .as("token"))
        val vocab = toks.groupBy($"token").agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"token".asc).limit(100)
          .select($"token", lit(1).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("token"), "left")
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("tokens_total"),
            sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("oov_total"))
          .withColumn("oov_frac",
            floor($"oov_total" * 10000.0 / $"tokens_total") / 10000.0)
          .orderBy($"lang")
      },
      Some("""
        WITH toks AS (
          SELECT lang,
                 unnest(list_filter(string_split(trim(text), ' '),
                                    x -> x <> '')) AS token
          FROM documents),
        df AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
        vocab AS (SELECT token FROM df ORDER BY n DESC, token LIMIT 100)
        SELECT lang,
               CAST(count(*) AS BIGINT) AS tokens_total,
               CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT)
                 AS oov_total,
               floor(count(*) FILTER (WHERE v.token IS NULL) * 10000.0
                     / count(*)) / 10000.0 AS oov_frac
        FROM toks LEFT JOIN vocab v ON toks.token = v.token
        GROUP BY lang ORDER BY lang""")),

    Q(
      "q187_kneser_ney_counts",
      "N-GRAM LM COUNT TABLES (Kneser-Ney ingredients) — the corpus " +
        "statistics a KenLM-style quality-filter model trains from: " +
        "for the top-20 trigrams (count desc, lexical tie-break — a " +
        "unique total order), the raw trigram count, the CONTINUATION " +
        "count (distinct left contexts of the (w2,w3) suffix — KN's " +
        "novel-continuation numerator), and the HISTORY total (all " +
        "trigrams opening with (w1,w2) — the backoff denominator). " +
        "Three aggregations over one exploded trigram stream; the " +
        "continuation count needs NO distinct-aggregate because the " +
        "grouped trigram table already has one row per distinct " +
        "(w1,w2,w3) — counting rows per suffix IS the distinct-context " +
        "count. Scale: the Zipf head collapses map-side in all three " +
        "aggregates; the two enrichment joins key on suffix/prefix " +
        "pairs (AQE splits the hot ones); top-k is a distributed heap.",
      (s, dir) => {
        import s.implicits._
        val tri = Tables.t(s, dir, "documents")
          .select(filter(split(trim($"text"), " "), x => x =!= lit(""))
            .as("tk"))
          .filter(size($"tk") >= 3)
          .select(explode(expr(
            "transform(sequence(0, size(tk) - 3), " +
              "i -> struct(tk[i] AS w1, tk[i+1] AS w2, tk[i+2] AS w3))"))
            .as("t"))
          .select($"t.w1", $"t.w2", $"t.w3")
        val counts = tri.groupBy($"w1", $"w2", $"w3")
          .agg(count(lit(1)).as("n"))
        val cont = counts.groupBy($"w2", $"w3")
          .agg(count(lit(1)).as("cont_n"))
        val hist = counts.groupBy($"w1", $"w2")
          .agg(sum($"n").as("hist_n"))
        counts.join(cont, Seq("w2", "w3")).join(hist, Seq("w1", "w2"))
          .select($"w1", $"w2", $"w3", $"n", $"cont_n", $"hist_n")
          .orderBy($"n".desc, $"w1", $"w2", $"w3")
          .limit(20)
      },
      Some("""
        WITH t AS (SELECT list_filter(string_split(trim(text), ' '),
                                      x -> x <> '') AS tk
                   FROM documents),
        tri AS (SELECT unnest([{'w1': tk[i], 'w2': tk[i+1], 'w3': tk[i+2]}
                               for i in range(1, len(tk) - 1)]) AS g
                FROM t WHERE len(tk) >= 3),
        f AS (SELECT g.w1 AS w1, g.w2 AS w2, g.w3 AS w3 FROM tri),
        c AS (SELECT w1, w2, w3, count(*) AS n FROM f GROUP BY 1, 2, 3),
        cont AS (SELECT w2, w3, count(*) AS cont_n FROM c GROUP BY 1, 2),
        hist AS (SELECT w1, w2, CAST(sum(n) AS BIGINT) AS hist_n
                 FROM c GROUP BY 1, 2)
        SELECT c.w1, c.w2, c.w3, c.n,
               CAST(cont.cont_n AS BIGINT) AS cont_n, hist.hist_n
        FROM c JOIN cont USING (w2, w3) JOIN hist USING (w1, w2)
        ORDER BY n DESC, w1, w2, w3
        LIMIT 20""")),

    Q(
      "q214_compression_quality",
      "COMPRESSION-RATIO QUALITY FILTER: per-doc DEFLATE(level 6) size " +
        "over raw UTF-8 size in basis points — the classic cheap " +
        "gibberish/boilerplate detector (highly repetitive spam " +
        "compresses far below prose; random noise barely compresses at " +
        "all), used as a pre-filter tier alongside q52's heuristics and " +
        "q121's bigram repetition. The kernel is the native codegen'd " +
        "DeflateLen expression over a THREAD-LOCAL reused " +
        "java.util.zip.Deflater (reset per row, never reallocated — " +
        "the codec CALL is the one thing Catalyst can't express, but " +
        "the expression wrapper stays inside whole-stage codegen with " +
        "no UDF encoder round-trip). No SQL oracle " +
        "(DuckDB has no deflate); ExperimentationSpec pins determinism, " +
        "the repetitive<prose<incompressible ordering, and exact " +
        "conservation of flag counts. Pure per-row projection + one " +
        "bounded sort: zero shuffle before the top-level ORDER BY, " +
        "linear at any corpus size, and the flag threshold (2500 bp) " +
        "is the tunable a 100 TB run sweeps on a sample first.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select($"doc_id",
            // octet_length, not length: the kernel compresses UTF-8
            // BYTES, so a char count would inflate ratio_bp up to 2x
            // on multibyte-language docs
            octet_length($"text").cast("long").as("n_bytes"),
            graft.catalyst.VecOps.deflate_len($"text").as("deflate_bytes"))
          .withColumn("ratio_bp",
            expr("(10000 * deflate_bytes) div n_bytes"))
          .withColumn("too_compressible", $"ratio_bp" < 2500)
          .orderBy($"doc_id")
      },
      None),

    Q(
      "q262_vocab_growth",
      "HEAPS'-LAW VOCABULARY GROWTH CURVE: cumulative distinct " +
        "whitespace-token types vs cumulative token volume across ten " +
        "equi-width doc_id ranges (doc_id is the ingest sequence, so " +
        "the buckets read as 'corpus so far at 10%, 20%, ...') — the " +
        "curve a tokenizer-training run reads to decide when vocab " +
        "collection has saturated (types grow ~K*tokens^beta, " +
        "beta<1; a FLATTENING cum_types column is the stop signal, and " +
        "a bucket where new_types jumps flags a domain shift, q136's " +
        "signal at the vocabulary level). The distinct-types-so-far " +
        "problem is made one-pass by the FIRST-OCCURRENCE trick: a " +
        "type is new in the bucket of its min(doc_id), so cum distinct " +
        "over N docs collapses to one token-keyed min-aggregate (the " +
        "only row-scale shuffle, map-side combined) + a 10-row cumsum. " +
        "Bucket bounds come from a broadcast 1-row min/max frame — " +
        "closed-form, no global sort, no per-doc window: the " +
        "ntile/row_number formulation every SQL cookbook reaches for " +
        "would single-partition-sort ALL docs at 100 TB; this plan " +
        "never orders anything wider than 10 rows.",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
        val bounds = broadcast(docs.agg(
          min($"doc_id").as("mn"), max($"doc_id").as("mx")))
        def bucketOf(c: String): Column =
          expr(s"least(9, ($c - mn) * 10 div (mx - mn + 1))")
        val tok = docs
          .select($"doc_id", explode(split(trim($"text"), " ")).as("token"))
        val perDoc = tok.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_toks"))
          .crossJoin(bounds)
          .groupBy(bucketOf("doc_id").as("bucket"))
          .agg(count(lit(1)).as("docs"), sum($"n_toks").as("tokens"))
        val firstSeen = tok.groupBy($"token")
          .agg(min($"doc_id").as("first_doc"))
          .crossJoin(bounds)
          .groupBy(bucketOf("first_doc").as("bucket"))
          .agg(count(lit(1)).as("new_types"))
        val w = Window.orderBy($"bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perDoc.join(firstSeen, Seq("bucket"), "left")
          .na.fill(0L, Seq("new_types"))
          .select($"bucket", $"docs", $"tokens", $"new_types",
            sum($"docs").over(w).as("cum_docs"),
            sum($"tokens").over(w).as("cum_tokens"),
            sum($"new_types").over(w).as("cum_types"))
          .orderBy($"bucket")
      },
      Some("""
        WITH b AS (
          SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
        tok AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
          FROM documents),
        per_doc AS (
          SELECT least(9, (d.doc_id - b.mn) * 10 // (b.mx - b.mn + 1))
                   AS bucket,
                 CAST(count(*) AS BIGINT) AS docs,
                 CAST(sum(n_toks) AS BIGINT) AS tokens
          FROM (SELECT doc_id, count(*) AS n_toks FROM tok GROUP BY 1) d, b
          GROUP BY 1),
        first_seen AS (
          SELECT least(9, (f.first_doc - b.mn) * 10 // (b.mx - b.mn + 1))
                   AS bucket,
                 CAST(count(*) AS BIGINT) AS new_types
          FROM (SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY 1) f,
               b
          GROUP BY 1)
        SELECT p.bucket, p.docs, p.tokens,
               CAST(coalesce(f.new_types, 0) AS BIGINT) AS new_types,
               CAST(sum(p.docs) OVER w AS BIGINT) AS cum_docs,
               CAST(sum(p.tokens) OVER w AS BIGINT) AS cum_tokens,
               CAST(sum(coalesce(f.new_types, 0)) OVER w AS BIGINT)
                 AS cum_types
        FROM per_doc p LEFT JOIN first_seen f ON p.bucket = f.bucket
        WINDOW w AS (ORDER BY p.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY p.bucket""")),

    Q(
      "q263_zipf_fit",
      "ZIPF RANK-FREQUENCY FIT over the top-1000 token types, kept " +
        "INTEGER-EXACT end to end: both log axes use floor(log2) " +
        "computed as length(bin(x)) - 1 — a bit-length, identical on " +
        "both engines, where ln()-based least squares would hang the " +
        "fit on last-ulp libm agreement — and the OLS slope/intercept " +
        "come out as sign(num) * (|num| * 1e6 div den) micro-units " +
        "(sign pulled out BEFORE the floor division because Spark's " +
        "div truncates toward zero while DuckDB's // floors: on the " +
        "always-negative Zipf slope the raw idiom would differ by one " +
        "micro whenever den does not divide num). slope_micro near " +
        "-1e6 is the classic Zipf exponent ~1; r2_bp gates fit " +
        "quality. The corpus-scale work is ONE token-keyed count " +
        "(map-side combined) followed by TakeOrderedAndProject's " +
        "per-partition top-1000 merge — no global sort; every window " +
        "after that runs on the 1000-row rank domain.",
      (s, dir) => {
        import s.implicits._
        val freqs = Tables.t(s, dir, "documents")
          .select(explode(split(trim($"text"), " ")).as("token"))
          .groupBy($"token").agg(count(lit(1)).as("freq"))
          .orderBy($"freq".desc, $"token").limit(1000)
        val ranked = freqs
          .withColumn("rk", row_number().over(
            Window.orderBy($"freq".desc, $"token"))) // 1000-row domain
          .select(
            (length(bin($"rk")) - 1).cast("long").as("x"),
            (length(bin($"freq")) - 1).cast("long").as("y"))
        ranked
          .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
            sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"),
            sum($"y" * $"y").as("syy"))
          .select(
            $"n",
            ($"n" * $"sxy" - $"sx" * $"sy").as("cov_num"),
            ($"n" * $"sxx" - $"sx" * $"sx").as("var_x_num"),
            expr("(case when n * sxy - sx * sy < 0 then -1 else 1 end) * " +
              "((abs(n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx))")
              .as("slope_micro"),
            expr("(case when sy * sxx - sx * sxy < 0 then -1 else 1 end) * " +
              "((abs(sy * sxx - sx * sxy) * 1000000) div (n * sxx - sx * sx))")
              .as("intercept_micro"),
            // cov^2 * 1e4 crosses int64 (~2.5e19 worst case on this
            // domain): widen to DECIMAL internally, emit BIGINT <= 10000
            expr("cast((cast(n * sxy - sx * sy as decimal(38,0)) * " +
              "(n * sxy - sx * sy) * 10000) div " +
              "(cast(n * sxx - sx * sx as decimal(38,0)) * " +
              "(n * syy - sy * sy)) as bigint)").as("r2_bp"))
      },
      Some("""
        WITH freqs AS (
          SELECT token, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
                FROM documents)
          GROUP BY 1 ORDER BY freq DESC, token LIMIT 1000),
        ranked AS (
          SELECT CAST(length(bin(CAST(row_number() OVER
                   (ORDER BY freq DESC, token) AS BIGINT))) - 1 AS BIGINT)
                   AS x,
                 CAST(length(bin(freq)) - 1 AS BIGINT) AS y
          FROM freqs),
        a AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(y * y) AS BIGINT) AS syy
          FROM ranked)
        SELECT n,
               n * sxy - sx * sy AS cov_num,
               n * sxx - sx * sx AS var_x_num,
               (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
                 * ((abs(n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx))
                 AS slope_micro,
               (CASE WHEN sy * sxx - sx * sxy < 0 THEN -1 ELSE 1 END)
                 * ((abs(sy * sxx - sx * sxy) * 1000000) // (n * sxx - sx * sx))
                 AS intercept_micro,
               CAST((CAST(n * sxy - sx * sy AS HUGEINT) * (n * sxy - sx * sy)
                     * 10000)
                 // (CAST(n * sxx - sx * sx AS HUGEINT)
                    * (n * syy - sy * sy)) AS BIGINT) AS r2_bp
        FROM a""")),

    Q(
      "q277_rake_keywords",
      "RAKE KEYWORD EXTRACTION (Rapid Automatic Keyword Extraction, " +
        "Rose et al. 2010 — public): candidate phrases are maximal " +
        "token runs between stopwords, each word scores " +
        "degree/frequency where degree sums the LENGTHS of every " +
        "phrase the word occurrence sits in (words that live in long " +
        "multi-word phrases outrank equally-frequent words that " +
        "appear alone — the co-occurrence signal TF-IDF (q57) has no " +
        "view of). Phrase segmentation is the prefix-sum trick: " +
        "stopword flags cumsum into phrase ids inside ONE " +
        "doc-partitioned position window (gaps-and-islands, q143's " +
        "recipe on tokens), phrase lengths aggregate on (doc, phrase), " +
        "and the score is the exact rational degree*1e6 div freq. " +
        "Top-15 on the bounded vocabulary domain. One token explode, " +
        "doc-keyed windows, map-side-combined word rollups — linear " +
        "at corpus scale.",
      (s, dir) => {
        import s.implicits._
        val stop = Seq("a", "the")
        val tok = Tables.t(s, dir, "documents")
          .select($"doc_id",
            posexplode(split(trim($"text"), " ")).as(Seq("pos", "token")))
          .withColumn("is_stop", $"token".isInCollection(stop))
        val wPos = Window.partitionBy($"doc_id").orderBy($"pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val phrased = tok
          .withColumn("phrase_id", sum($"is_stop".cast("long")).over(wPos))
          .filter(!$"is_stop")
        val plen = phrased.groupBy($"doc_id", $"phrase_id")
          .agg(count(lit(1)).as("plen"))
        phrased.join(plen, Seq("doc_id", "phrase_id"))
          .groupBy($"token")
          .agg(count(lit(1)).as("freq"), sum($"plen").as("degree"))
          .withColumn("score_micro", expr("(degree * 1000000) div freq"))
          .orderBy($"score_micro".desc, $"token")
          .limit(15)
      },
      Some("""
        WITH l AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks
          FROM documents),
        tok AS (
          SELECT doc_id, i AS pos, toks[i] AS token,
                 toks[i] IN ('a', 'the') AS is_stop
          FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
                FROM l)),
        phrased AS (
          SELECT doc_id, token,
                 sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS phrase_id,
                 is_stop
          FROM tok),
        np AS (SELECT doc_id, phrase_id, token FROM phrased
               WHERE NOT is_stop),
        plen AS (
          SELECT doc_id, phrase_id, count(*) AS plen
          FROM np GROUP BY 1, 2),
        scored AS (
          SELECT n.token, count(*) AS freq, sum(p.plen) AS degree
          FROM np n JOIN plen p USING (doc_id, phrase_id)
          GROUP BY n.token)
        SELECT token, CAST(freq AS BIGINT) AS freq,
               CAST(degree AS BIGINT) AS degree,
               CAST((degree * 1000000) // freq AS BIGINT) AS score_micro
        FROM scored
        ORDER BY score_micro DESC, token LIMIT 15""")),

    Q(
      "q279_rrf_hybrid",
      "HYBRID RETRIEVAL VIA RECIPROCAL RANK FUSION (Cormack et al. " +
        "2009 — public): fuse the LEXICAL list (q165's BM25 kernel via " +
        "the shared bm25Scores, top-30 for {query, window, scan}) with " +
        "the SEMANTIC list (cosine to the fixture query embedding " +
        "vec_id=0, q66's rounding/tiebreak convention, top-30 over the " +
        "aligned doc_id=vec_id key) by rrf = sum over lists of " +
        "1/(60+rank) — carried as EXACT integer nanos " +
        "(1e9 div (60+r)), so fusion is pure rank arithmetic: no score " +
        "normalization across incommensurable scales, the whole reason " +
        "RRF beat score fusion in the TREC runs. Docs on one list only " +
        "contribute that list's term (full-outer fuse). The two legs " +
        "are independent scans — lexical shuffles 8-byte postings, " +
        "semantic broadcasts one probe onto the corpus scan — and the " +
        "fuse itself is a join of two 30-row lists: at 100 TB the cost " +
        "IS the legs, and each leg is its already-gated retrieval " +
        "plan (q165 postings, q66/q97 ANN).",
      (s, dir) => rrfTop10(s, dir),
      Some("""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(trim(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        lens AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
        corpus AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len
                   FROM lens),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
               WHERE w IN ('query', 'window', 'scan') GROUP BY 1, 2),
        idf AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        t AS (SELECT tf.doc_id, tf.tf, lens.len, idf.df, c.n_docs,
                     CAST(c.sum_len AS DOUBLE) / c.n_docs AS avgdl
              FROM tf JOIN lens USING (doc_id) JOIN idf USING (w)
              CROSS JOIN corpus c),
        sc AS (SELECT doc_id,
                      CAST(floor(((((n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2))
                             / (tf + 1.2 * (0.25 + 0.75 * (len / avgdl))))
                           * 1000000.0 + 0.5) AS BIGINT) AS sc
               FROM t),
        bm AS (SELECT doc_id, CAST(sum(sc) AS BIGINT) AS bm25_micros
               FROM sc GROUP BY doc_id
               ORDER BY bm25_micros DESC, doc_id LIMIT 30),
        lex AS (SELECT doc_id,
                       row_number() OVER (ORDER BY bm25_micros DESC, doc_id)
                         AS r_lex
                FROM bm),
        probe AS (SELECT embedding AS probe_vec FROM embeddings
                  WHERE vec_id = 0),
        scored AS (SELECT vec_id,
                          round(list_cosine_similarity(
                            CAST(embedding AS DOUBLE[]),
                            CAST(probe_vec AS DOUBLE[])), 6) AS cos
                   FROM embeddings CROSS JOIN probe
                   WHERE vec_id <> 0
                   ORDER BY cos DESC, vec_id LIMIT 30),
        sem AS (SELECT vec_id AS doc_id,
                       row_number() OVER (ORDER BY cos DESC, vec_id) AS r_sem
                FROM scored),
        fused AS (SELECT coalesce(l.doc_id, m.doc_id) AS doc_id,
                         l.r_lex, m.r_sem
                  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.doc_id)
        SELECT doc_id, r_lex, r_sem,
               CAST(coalesce(1000000000 // (60 + r_lex), 0)
                    + coalesce(1000000000 // (60 + r_sem), 0) AS BIGINT)
                 AS rrf_nano
        FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT 10""")),

    Q(
      "q282_vocab_richness",
      "VOCABULARY RICHNESS ESTIMATORS per language — the asymptote " +
        "question q262's Heaps curve only extrapolates: how many types " +
        "does the language's vocabulary HOLD, and how much probability " +
        "mass is still unseen? Bias-corrected Chao1 richness " +
        "D + f1(f1-1)/(2(f2+1)) (Chao 1984 — the f2=0 guard built into " +
        "the estimator, no NULL branch), Good-Turing unseen mass " +
        "f1/N (the missing-mass estimate LM smoothing allocates, " +
        "q149's KN context), and Simpson concentration " +
        "sum c(c-1)/(N(N-1)) (repeat-draw collision probability — high " +
        "= boilerplate-heavy corpus). All three are exact integer " +
        "rationals in micros/ppm from ONE (lang, token) count table: " +
        "the token-keyed groupBy map-side-combines the Zipf head " +
        "before the wire (q50's argument), then the frequency-of-" +
        "frequencies rollup runs on the 5-value lang domain. Every " +
        "divisor is structurally positive, so integer division " +
        "truncation never meets a negative numerator.",
      (s, dir) => {
        import s.implicits._
        val tc = Tables.t(s, dir, "documents")
          .select($"lang", explode(split(trim($"text"), " ")).as("w"))
          .filter($"w" =!= "")
          .groupBy($"lang", $"w").agg(count(lit(1)).as("c"))
        tc.groupBy($"lang").agg(
            count(lit(1)).as("d_types"),
            sum($"c").as("n_tokens"),
            sum(when($"c" === 1, 1L).otherwise(0L)).as("f1"),
            sum(when($"c" === 2, 1L).otherwise(0L)).as("f2"),
            sum($"c" * ($"c" - 1)).as("coll2"))
          .select($"lang", $"d_types", $"n_tokens", $"f1", $"f2",
            expr("d_types * 1000000 " +
              "+ (f1 * (f1 - 1) * 1000000) div (2 * (f2 + 1))")
              .as("chao1_micro"),
            expr("(f1 * 1000000) div n_tokens").as("gt_unseen_ppm"),
            expr("(coll2 * 1000000) div (n_tokens * (n_tokens - 1))")
              .as("simpson_ppm"))
          .orderBy($"lang")
      },
      Some("""
        WITH tok AS (SELECT lang,
                            unnest(list_filter(string_split(trim(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        tc AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
        g AS (SELECT lang, count(*) AS d_types,
                     CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f1,
                     CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f2,
                     CAST(sum(c * (c - 1)) AS BIGINT) AS coll2
              FROM tc GROUP BY 1)
        SELECT lang, d_types, n_tokens, f1, f2,
               d_types * 1000000
                 + (f1 * (f1 - 1) * 1000000) // (2 * (f2 + 1)) AS chao1_micro,
               (f1 * 1000000) // n_tokens AS gt_unseen_ppm,
               (coll2 * 1000000) // (n_tokens * (n_tokens - 1)) AS simpson_ppm
        FROM g ORDER BY lang""")),

    Q(
      "q300_rag_context_assembly",
      "RAG CONTEXT ASSEMBLY — the retrieval stack composed end to end " +
        "(the q137-style pipeline query for the IR family): q279's " +
        "fused hybrid top-10 (the SHARED rrfTop10, so retrieval here " +
        "can never drift from the standalone query), each doc costed " +
        "in whitespace tokens, greedily PREFIX-PACKED into a 400-token " +
        "context budget in fusion-rank order (prefix rule, not " +
        "skip-and-fill: rank order is the relevance contract, so the " +
        "first doc that overflows ends the context — the kept flag " +
        "makes the cut auditable). Output is the assembled context " +
        "manifest: rank, doc, both leg ranks, token cost, running " +
        "total, kept. The budget arithmetic is one cumulative sum over " +
        "a 10-row frame; the corpus-scale cost IS q279's two retrieval " +
        "legs.",
      (s, dir) => {
        import s.implicits._
        val top = rrfTop10(s, dir)
          .withColumn("rank", row_number().over(
            Window.orderBy($"rrf_nano".desc, $"doc_id")).cast("long"))
        val toks = Tables.t(s, dir, "documents")
          .select($"doc_id",
            expr("cast(size(filter(split(trim(text), ' '), " +
              "x -> x != '')) as bigint)").as("n_tokens"))
        top.join(toks, Seq("doc_id"))
          .withColumn("cum_tokens", sum($"n_tokens").over(
            Window.orderBy($"rank")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("kept", $"cum_tokens" <= 400)
          .select($"rank", $"doc_id", $"r_lex", $"r_sem", $"rrf_nano",
            $"n_tokens", $"cum_tokens", $"kept")
          .orderBy($"rank")
      },
      Some("""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(trim(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        lens AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
        corpus AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len
                   FROM lens),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
               WHERE w IN ('query', 'window', 'scan') GROUP BY 1, 2),
        idf AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        t AS (SELECT tf.doc_id, tf.tf, lens.len, idf.df, c.n_docs,
                     CAST(c.sum_len AS DOUBLE) / c.n_docs AS avgdl
              FROM tf JOIN lens USING (doc_id) JOIN idf USING (w)
              CROSS JOIN corpus c),
        sc AS (SELECT doc_id,
                      CAST(floor(((((n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2))
                             / (tf + 1.2 * (0.25 + 0.75 * (len / avgdl))))
                           * 1000000.0 + 0.5) AS BIGINT) AS sc
               FROM t),
        bm AS (SELECT doc_id, CAST(sum(sc) AS BIGINT) AS bm25_micros
               FROM sc GROUP BY doc_id
               ORDER BY bm25_micros DESC, doc_id LIMIT 30),
        lex AS (SELECT doc_id,
                       row_number() OVER (ORDER BY bm25_micros DESC, doc_id)
                         AS r_lex
                FROM bm),
        probe AS (SELECT embedding AS probe_vec FROM embeddings
                  WHERE vec_id = 0),
        scored AS (SELECT vec_id,
                          round(list_cosine_similarity(
                            CAST(embedding AS DOUBLE[]),
                            CAST(probe_vec AS DOUBLE[])), 6) AS cos
                   FROM embeddings CROSS JOIN probe
                   WHERE vec_id <> 0
                   ORDER BY cos DESC, vec_id LIMIT 30),
        sem AS (SELECT vec_id AS doc_id,
                       row_number() OVER (ORDER BY cos DESC, vec_id) AS r_sem
                FROM scored),
        fused AS (SELECT coalesce(l.doc_id, m.doc_id) AS doc_id,
                         l.r_lex, m.r_sem
                  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.doc_id),
        top AS (
          SELECT doc_id, r_lex, r_sem,
                 CAST(coalesce(1000000000 // (60 + r_lex), 0)
                      + coalesce(1000000000 // (60 + r_sem), 0) AS BIGINT)
                   AS rrf_nano
          FROM fused ORDER BY rrf_nano DESC, doc_id LIMIT 10),
        ranked AS (
          SELECT *, row_number() OVER (ORDER BY rrf_nano DESC, doc_id)
                      AS rank
          FROM top),
        packed AS (
          SELECT r.rank, r.doc_id, r.r_lex, r.r_sem, r.rrf_nano,
                 lens.len AS n_tokens,
                 CAST(sum(lens.len) OVER (ORDER BY r.rank
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
          FROM ranked r JOIN lens ON r.doc_id = lens.doc_id)
        SELECT rank, doc_id, r_lex, r_sem, rrf_nano,
               CAST(n_tokens AS BIGINT) AS n_tokens, cum_tokens,
               cum_tokens <= 400 AS kept
        FROM packed ORDER BY rank""")),

    Q(
      "q301_retrieval_agreement",
      "RETRIEVAL AGREEMENT AUDIT — the number that justifies q279's " +
        "fusion: overlap@k and Jaccard@k between the lexical (BM25) " +
        "and semantic (cosine) top-10 lists at k = 1, 5, 10. LOW " +
        "agreement means the two signals surface different relevant " +
        "docs — exactly when rank fusion buys recall; near-total " +
        "agreement would mean the second leg is redundant cost " +
        "(measured on the fixtures: ZERO overlap at every k — the " +
        "uniform-random embeddings carry no lexical signal, the " +
        "worst-case complementarity the fusion is built for). Both " +
        "legs reuse the standalone queries' scoring (bm25Scores; the " +
        "q66 cosine convention against probe vec_id=0), ranks join on " +
        "doc_id, and the k-grid evaluation is a 3-row cross join over " +
        "the <= 10-row intersection — corpus-scale cost is the two " +
        "retrieval legs, the audit arithmetic is free.",
      (s, dir) => {
        import s.implicits._
        val lex = bm25Scores(s, dir, Seq("query", "window", "scan"))
          .orderBy($"bm25_micros".desc, $"doc_id").limit(10)
          .withColumn("rl", row_number()
            .over(Window.orderBy($"bm25_micros".desc, $"doc_id"))
            .cast("long"))
          .select($"doc_id", $"rl")
        val e = Tables.t(s, dir, "embeddings")
        val probe = e.filter($"vec_id" === 0)
          .select($"embedding".as("probe_vec"))
        val sem = e.filter($"vec_id" =!= 0)
          .crossJoin(broadcast(probe))
          .withColumn("cos", round(
            graft.operators.Similarity.cosine($"embedding", $"probe_vec"), 6))
          .orderBy($"cos".desc, $"vec_id").limit(10)
          .withColumn("rs", row_number()
            .over(Window.orderBy($"cos".desc, $"vec_id")).cast("long"))
          .select($"vec_id".as("doc_id"), $"rs")
        val both = lex.join(sem, Seq("doc_id"))
        Seq(1L, 5L, 10L).toDF("k")
          .join(both, $"rl" <= $"k" && $"rs" <= $"k", "left")
          .groupBy($"k")
          .agg(count($"doc_id").as("overlap"))
          .withColumn("jaccard_bp",
            expr("(overlap * 10000) div (2 * k - overlap)"))
          .orderBy($"k")
      },
      Some("""
        WITH tok AS (SELECT doc_id,
                            unnest(list_filter(string_split(trim(text), ' '),
                                               x -> x <> '')) AS w
                     FROM documents),
        lens AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
        corpus AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len
                   FROM lens),
        tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
               WHERE w IN ('query', 'window', 'scan') GROUP BY 1, 2),
        idf AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        t AS (SELECT tf.doc_id, tf.tf, lens.len, idf.df, c.n_docs,
                     CAST(c.sum_len AS DOUBLE) / c.n_docs AS avgdl
              FROM tf JOIN lens USING (doc_id) JOIN idf USING (w)
              CROSS JOIN corpus c),
        sc AS (SELECT doc_id,
                      CAST(floor(((((n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2))
                             / (tf + 1.2 * (0.25 + 0.75 * (len / avgdl))))
                           * 1000000.0 + 0.5) AS BIGINT) AS sc
               FROM t),
        bm AS (SELECT doc_id, CAST(sum(sc) AS BIGINT) AS bm25_micros
               FROM sc GROUP BY doc_id
               ORDER BY bm25_micros DESC, doc_id LIMIT 10),
        lex AS (SELECT doc_id,
                       row_number() OVER (ORDER BY bm25_micros DESC, doc_id)
                         AS rl
                FROM bm),
        probe AS (SELECT embedding AS probe_vec FROM embeddings
                  WHERE vec_id = 0),
        scored AS (SELECT vec_id,
                          round(list_cosine_similarity(
                            CAST(embedding AS DOUBLE[]),
                            CAST(probe_vec AS DOUBLE[])), 6) AS cos
                   FROM embeddings CROSS JOIN probe
                   WHERE vec_id <> 0
                   ORDER BY cos DESC, vec_id LIMIT 10),
        sem AS (SELECT vec_id AS doc_id,
                       row_number() OVER (ORDER BY cos DESC, vec_id) AS rs
                FROM scored),
        bt AS (SELECT l.doc_id, l.rl, s.rs
                 FROM lex l JOIN sem s ON l.doc_id = s.doc_id),
        grid AS (SELECT unnest([1, 5, 10]) AS k)
        SELECT CAST(g.k AS BIGINT) AS k,
               CAST(count(b.doc_id) AS BIGINT) AS overlap,
               (CAST(count(b.doc_id) AS BIGINT) * 10000)
                 // (2 * g.k - count(b.doc_id)) AS jaccard_bp
        FROM grid g LEFT JOIN bt b ON b.rl <= g.k AND b.rs <= g.k
        GROUP BY g.k ORDER BY g.k""")),

    Q(
      "q309_repetition_runs",
      "DEGENERATE-REPETITION DETECTOR — q121 measures the duplicate-" +
        "bigram FRACTION (boilerplate); this finds CONSECUTIVE " +
        "identical-token runs ('the the the'), the signature of " +
        "degenerate generation loops and copy-paste stutter that a " +
        "set-level fraction can miss entirely (a doc can be 99% " +
        "unique bigrams and still contain one pathological 50-token " +
        "run). Classic gaps-and-islands: explode tokens with " +
        "position, mark run breaks via lag, running-sum the breaks " +
        "into island ids — both windows PARTITIONED by doc_id " +
        "(PlanSpec's no-row-scale-unpartitioned-window rule), so at " +
        "100 TB this is one doc-keyed exchange feeding two chained " +
        "windows and a per-doc aggregate. Emits every doc whose " +
        "longest run >= 2 with the run token (ties: longest run " +
        "first, then lexicographically smallest token — engine-" +
        "independent).",
      (s, dir) => {
        import s.implicits._
        val toks = Tables.t(s, dir, "documents")
          .select($"doc_id",
            posexplode(filter(split(trim($"text"), " "),
              x => x =!= lit(""))).as(Seq("i", "tok")))
        val w = Window.partitionBy($"doc_id").orderBy($"i")
        val runs = toks
          .withColumn("brk",
            when(lag($"tok", 1).over(w) === $"tok", 0).otherwise(1))
          .withColumn("island",
            sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy($"doc_id", $"island", $"tok")
          .agg(count(lit(1)).as("run_len"))
        // per-doc max via a doc-partitioned window, NOT a join against a
        // re-derived aggregate: the window rides the SAME doc_id
        // partitioning the islands pass created, so the whole query is
        // one row-scale exchange — a join form would re-run the
        // explode+windows pipeline a second time (two full scans)
        runs
          .withColumn("max_run",
            max($"run_len").over(Window.partitionBy($"doc_id")))
          .filter($"max_run" >= 2 && $"run_len" === $"max_run")
          .groupBy($"doc_id", $"max_run")
          .agg(min($"tok").as("run_token"))
          .select($"doc_id", $"max_run".cast("long").as("max_run"),
            $"run_token")
          .orderBy($"max_run".desc, $"doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, t.tok, t.i
          FROM (SELECT doc_id,
                  list_filter(string_split(trim(text), ' '),
                              x -> x <> '') AS ts
                FROM documents),
          LATERAL (SELECT unnest(ts) AS tok,
                          generate_subscripts(ts, 1) AS i) t),
        marked AS (
          SELECT doc_id, tok, i,
                 CASE WHEN tok = lag(tok) OVER
                   (PARTITION BY doc_id ORDER BY i) THEN 0 ELSE 1 END AS brk
          FROM toks),
        isl AS (
          SELECT doc_id, tok,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
          FROM marked),
        runs AS (
          SELECT doc_id, island, tok, count(*) AS run_len
          FROM isl GROUP BY 1, 2, 3),
        mx AS (
          SELECT doc_id, max(run_len) AS max_run
          FROM runs GROUP BY doc_id HAVING max(run_len) >= 2)
        SELECT r.doc_id AS doc_id, CAST(m.max_run AS BIGINT) AS max_run,
               min(r.tok) AS run_token
        FROM runs r JOIN mx m ON r.doc_id = m.doc_id
          AND r.run_len = m.max_run
        GROUP BY r.doc_id, m.max_run
        ORDER BY 2 DESC, 1""")),

    Q(
      "q310_tokenizer_fertility",
      "TOKENIZER FERTILITY BY LANGUAGE — the metric that drives " +
        "tokenizer and budget decisions for multilingual corpora: " +
        "per language, how many characters and UTF-8 BYTES one " +
        "hundred tokens cover, under BOTH token conventions the " +
        "corpus uses (q53's whitespace tokens and its BPE-ish regex " +
        "segments). Byte fertility diverges hard from char fertility " +
        "exactly where it matters (zh: ~3 bytes/char in UTF-8, so a " +
        "byte-level BPE pays ~3x the sequence length its char count " +
        "suggests — the compression-parity question every " +
        "multilingual tokenizer paper measures). All ratios are " +
        "cross-multiplied integer per-100-token figures (q127's " +
        "no-float discipline). One row-scale aggregate on lang with " +
        "map-side partials; the per-doc measures are codegen'd " +
        "projections (length/octet_length/regexp_extract_all) — at " +
        "100 TB this is a single scan-shaped pass.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select($"lang",
            length($"text").cast("long").as("chars"),
            octet_length($"text").cast("long").as("bytes"),
            size(split(trim($"text"), " ")).cast("long").as("ws"),
            size(regexp_extract_all($"text",
              lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
              .cast("long").as("bpeish"))
          .groupBy($"lang")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum($"chars").as("chars"), sum($"bytes").as("bytes"),
            sum($"ws").as("ws_tokens"), sum($"bpeish").as("bpeish_tokens"))
          .select($"lang", $"n_docs", $"chars", $"bytes",
            $"ws_tokens", $"bpeish_tokens",
            expr("chars * 100 DIV ws_tokens").as("chars_per_100ws"),
            expr("bytes * 100 DIV ws_tokens").as("bytes_per_100ws"),
            expr("chars * 100 DIV bpeish_tokens").as("chars_per_100bpeish"),
            expr("bytes * 100 DIV bpeish_tokens").as("bytes_per_100bpeish"))
          .orderBy($"lang")
      },
      Some("""
        WITH d AS (
          SELECT lang,
                 CAST(length(text) AS BIGINT) AS chars,
                 CAST(strlen(text) AS BIGINT) AS bytes,
                 CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS ws,
                 CAST(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS bpeish
          FROM documents),
        g AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(chars) AS BIGINT) AS chars,
                 CAST(sum(bytes) AS BIGINT) AS bytes,
                 CAST(sum(ws) AS BIGINT) AS ws_tokens,
                 CAST(sum(bpeish) AS BIGINT) AS bpeish_tokens
          FROM d GROUP BY lang)
        SELECT lang, n_docs, chars, bytes, ws_tokens, bpeish_tokens,
               chars * 100 // ws_tokens AS chars_per_100ws,
               bytes * 100 // ws_tokens AS bytes_per_100ws,
               chars * 100 // bpeish_tokens AS chars_per_100bpeish,
               bytes * 100 // bpeish_tokens AS bytes_per_100bpeish
        FROM g ORDER BY lang""")),

    Q(
      "q328_dataset_card",
      "DATASET CARD — the per-source summary table a corpus ships " +
        "with (the 'datasheet' every training-data release publishes), " +
        "composed from the repo's own conventions in one result: doc " +
        "count, whitespace-token mass (q53's convention), distinct " +
        "languages, EXACT-duplICATE doc count (text appearing >= 2 " +
        "times corpus-WIDE — q60's global key, deliberately not " +
        "per-source: cross-source dups are the ones that matter), " +
        "floor-truncated mean chars (q99's IEEE-identical rendering), " +
        "and the majority language with deterministic ties (max count, " +
        "then lang asc — max_by would tie-break engine-specifically). " +
        "Plan: ONE row-scale source aggregate for the count/token/lang " +
        "columns; the dup flag is a text-keyed self-aggregate (at " +
        "100 TB the key becomes xxhash64(text) + verify-on-collision, " +
        "q178's note) joined back as a LEFT SEMI per doc; top-lang " +
        "ranks on the bounded (source x lang) domain. Three shuffles " +
        "total, each on the natural key.",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.t(s, dir, "documents")
        val base = docs.select($"doc_id", $"source", $"lang", $"n_chars",
          size(filter(split(trim($"text"), " "), x => x =!= lit("")))
            .cast("long").as("tk"), $"text")
        val perSrc = base.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"tk").as("total_tokens"),
            countDistinct($"lang").as("n_langs"),
            (floor(sum($"n_chars") * 10000.0 / count(lit(1))) / 10000.0)
              .as("avg_chars"))
        val dupTexts = base.groupBy($"text")
          .agg(count(lit(1)).as("n")).filter($"n" > 1).select($"text")
        val dups = base.join(dupTexts, Seq("text"), "left_semi")
          .groupBy($"source").agg(count(lit(1)).as("dup_docs"))
        val topLang = base.groupBy($"source", $"lang")
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(
            Window.partitionBy($"source").orderBy($"n".desc, $"lang")))
          .filter($"rk" === 1)
          .select($"source", $"lang".as("top_lang"))
        perSrc
          .join(dups, Seq("source"), "left")
          .join(topLang, Seq("source"))
          .select($"source", $"n_docs", $"total_tokens", $"n_langs",
            coalesce($"dup_docs", lit(0L)).as("dup_docs"),
            $"avg_chars", $"top_lang")
          .orderBy($"source")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, source, lang, n_chars,
                 CAST(len(list_filter(string_split(trim(text), ' '),
                   x -> x <> '')) AS BIGINT) AS tk,
                 text
          FROM documents),
        per_src AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(tk) AS BIGINT) AS total_tokens,
                 CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                 floor(sum(n_chars) * 10000.0 / count(*)) / 10000.0
                   AS avg_chars
          FROM base GROUP BY source),
        dup_texts AS (
          SELECT text FROM base GROUP BY text HAVING count(*) > 1),
        dups AS (
          SELECT source, CAST(count(*) AS BIGINT) AS dup_docs
          FROM base WHERE text IN (SELECT text FROM dup_texts)
          GROUP BY source),
        top_lang AS (
          SELECT source, lang AS top_lang FROM (
            SELECT source, lang, count(*) AS n,
                   row_number() OVER (PARTITION BY source
                     ORDER BY count(*) DESC, lang) AS rk
            FROM base GROUP BY source, lang) WHERE rk = 1)
        SELECT p.source, p.n_docs, p.total_tokens, p.n_langs,
               CAST(coalesce(d.dup_docs, 0) AS BIGINT) AS dup_docs,
               p.avg_chars, t.top_lang
        FROM per_src p
        LEFT JOIN dups d ON p.source = d.source
        JOIN top_lang t ON p.source = t.source
        ORDER BY p.source""")),

    Q(
      "q336_perplexity_filter",
      "QUANTIZED-PERPLEXITY OUTLIER FILTER — the CCNet-style 'drop what " +
        "the unigram LM finds surprising' pass with ZERO libm risk: " +
        "per-token surprisal floor(2*log2(N/freq)) computed as " +
        "length(bin(q*q)) - 1 (a binary string's length IS " +
        "floor(log2)+1, and squaring first buys half-bit resolution; " +
        "q^2 stays inside BIGINT for corpora to ~3e9 tokens — past " +
        "that, drop the squaring and take whole bits), per-doc mean in " +
        "exact centibits, then the top-3 most-surprising docs PER " +
        "LANGUAGE (rank window over the per-lang doc frame, doc_id " +
        "tie-break) — the rare-token-heavy docs a perplexity filter " +
        "drops first, reported per language so one high-resource " +
        "language cannot monopolize the drop list. Plan: one doc scan " +
        "-> token explode -> vocab count (map-side combine collapses " +
        "the Zipf head); N is a 1-row sum OF THE VOCAB frame (no " +
        "second corpus pass), broadcast; surprisal rejoins on token; " +
        "per-doc sum; the rank window runs per-lang on the doc-grain " +
        "frame. The vocab frame feeds two consumers (N + the join) -> " +
        "localCheckpoint.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang",
            explode(split(trim($"text"), " ")).as("token"))
        val freq = tok.groupBy($"token")
          .agg(count(lit(1)).as("freq")).localCheckpoint(true)
        val n = broadcast(freq.agg(sum($"freq").as("nt")))
        val doc = tok.join(freq, "token").crossJoin(n)
          .select($"doc_id", $"lang",
            (length(expr("bin((nt div freq) * (nt div freq))")) - 1)
              .cast("long").as("hbits"))
          .groupBy($"doc_id", $"lang")
          .agg(count(lit(1)).as("n_tokens"), sum($"hbits").as("sb"))
          .select($"doc_id", $"lang", $"n_tokens",
            expr("sb * 100 div (2 * n_tokens)").as("centibits"))
        doc.withColumn("rk", row_number().over(
            Window.partitionBy($"lang")
              .orderBy($"centibits".desc, $"doc_id")).cast("long"))
          .filter($"rk" <= 3)
          .select($"lang", $"rk", $"doc_id", $"n_tokens", $"centibits")
          .orderBy($"lang", $"rk")
      },
      Some("""
        WITH tok AS (SELECT doc_id, lang,
               unnest(string_split(trim(text), ' ')) AS token
             FROM documents),
        freq AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
                 FROM tok GROUP BY 1),
        n AS (SELECT CAST(sum(freq) AS BIGINT) AS nt FROM freq),
        doc AS (
          SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(sum(length(bin((nt // freq) * (nt // freq))) - 1)
                   AS BIGINT) AS sb
          FROM tok JOIN freq USING (token) CROSS JOIN n
          GROUP BY 1, 2),
        cb AS (SELECT doc_id, lang, n_tokens,
                 sb * 100 // (2 * n_tokens) AS centibits FROM doc),
        r AS (SELECT lang, doc_id, n_tokens, centibits,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY centibits DESC, doc_id) AS BIGINT) AS rk
              FROM cb)
        SELECT lang, rk, doc_id, n_tokens, centibits
        FROM r WHERE rk <= 3
        ORDER BY lang, rk""")),

    Q(
      "q340_rag_chunker",
      "FIXED-STRIDE RAG CHUNKER + OVERLAP LEDGER — the standard " +
        "retrieval-corpus prep step (window W=32 tokens, stride S=24, " +
        "25% overlap) that q335's content-defined chunker is the " +
        "storage-side alternative to: chunk starts are sequence(1, " +
        "greatest(len-W+S, 1), S), which PROVABLY yields full coverage " +
        "with zero fully-redundant tail chunks (the last start L " +
        "satisfies L > len-W, so its chunk reaches len; a start past " +
        "len-W+S would add no new token). Ledger per source: docs, " +
        "chunks, chunk-token sum vs doc-token sum (overlap cost in " +
        "ppm — the index-size tax RAG pays for windowing), and " +
        "corpus-wide duplicated chunks (identical chunk text emitted " +
        "from different positions/docs — pre-dedup before embedding " +
        "those chunks saves embedding compute). Plan: chunking is a " +
        "narrow per-row transform+explode inside codegen (chunks " +
        "leave the scan as mod-1e9+7 poly-hashes + token counts, " +
        "never strings); duplicate detection is ONE window count on " +
        "the chunk-hash partition; per-doc then per-source rollups " +
        "ride the same rows. 100 TB: a map pass plus one hash-keyed " +
        "row-scale shuffle — same envelope as q335/q339.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        def ph(c: String) =
          s"aggregate(transform(split($c, ''), ch -> ascii(ch)), 0L, " +
            s"(h, b) -> (h * 263 + b) % 1000000007)"
        val rows = Tables.t(s, dir, "documents")
          .select($"doc_id", $"source", split(trim($"text"), " ").as("t"))
          .select($"doc_id", $"source", size($"t").cast("long").as("len"),
            explode(expr(
              "transform(sequence(1, greatest(size(t) - 8, 1), 24), " +
                "st -> array_join(slice(t, st, 32), ' '))")).as("chunk"))
          .select($"doc_id", $"source", $"len",
            expr(ph("chunk")).as("chunk_hash"),
            (size(split($"chunk", " "))).cast("long").as("ctoks"))
        val perDoc = rows
          .withColumn("f",
            count(lit(1)).over(Window.partitionBy($"chunk_hash")))
          .groupBy($"doc_id", $"source")
          .agg(count(lit(1)).as("n_chunks"),
            sum($"ctoks").as("chunk_tokens"),
            min($"len").as("doc_tokens"),
            sum(when($"f" > 1, 1L).otherwise(0L)).as("dup_chunks"))
        perDoc.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chunks").as("n_chunks"),
            sum($"chunk_tokens").as("chunk_tokens"),
            sum($"doc_tokens").as("doc_tokens"),
            sum($"dup_chunks").as("dup_chunks"))
          .withColumn("overlap_ppm", expr(
            "(chunk_tokens - doc_tokens) * 1000000 div doc_tokens"))
          .orderBy($"source")
      },
      Some("""
        WITH d AS (SELECT doc_id, source,
               string_split(trim(text), ' ') AS ws FROM documents),
        st AS (SELECT doc_id, source, ws,
                 CAST(len(ws) AS BIGINT) AS len,
                 unnest(range(1, greatest(len(ws) - 8, 1) + 1, 24)) AS s
               FROM d),
        ch AS (SELECT doc_id, source, len,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   [CAST(ascii(c) AS BIGINT) for c in
                    string_split(array_to_string(ws[s:s+31], ' '), '')]),
                   (h, b) -> (h * 263 + b) % 1000000007) AS chunk_hash,
                 CAST(len(ws[s:s+31]) AS BIGINT) AS ctoks
               FROM st),
        fr AS (SELECT doc_id, source, len, ctoks,
                 count(*) OVER (PARTITION BY chunk_hash) AS f FROM ch),
        pd AS (SELECT doc_id, source,
                 CAST(count(*) AS BIGINT) AS n_chunks,
                 CAST(sum(ctoks) AS BIGINT) AS chunk_tokens,
                 CAST(min(len) AS BIGINT) AS doc_tokens,
                 CAST(sum(CASE WHEN f > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_chunks
               FROM fr GROUP BY 1, 2)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
               CAST(sum(chunk_tokens) AS BIGINT) AS chunk_tokens,
               CAST(sum(doc_tokens) AS BIGINT) AS doc_tokens,
               CAST(sum(dup_chunks) AS BIGINT) AS dup_chunks,
               CAST((sum(chunk_tokens) - sum(doc_tokens)) * 1000000
                 // sum(doc_tokens) AS BIGINT) AS overlap_ppm
        FROM pd GROUP BY source ORDER BY source""")),

    Q(
      "q341_lang_kl_matrix",
      "PAIRWISE LANGUAGE KL-DIVERGENCE MATRIX — the domain-similarity " +
        "map mixture design reads before setting q124's weights and " +
        "the pairwise generalization of q337's two-domain DSIR score: " +
        "for every ORDERED language pair (a, b), the quantized " +
        "KL(p_a || q_b) where p_a is lang a's unsmoothed unigram MLE " +
        "(zero-count tokens contribute exactly 0) and q_b is lang b's " +
        "add-1-smoothed LM over the GLOBAL vocab (no zero division by " +
        "construction). Same no-libm half-bit family as q336/q337: " +
        "each log2 enters as length(bin(x*x)) - 1, so kl_hb = " +
        "sum_t ca*(hb(ca) - hb(cb+1)) + Na*(hb(Nb+V) - hb(Na)) is " +
        "plain BIGINT arithmetic both engines replay bit-for-bit " +
        "(quantization can dip a near-zero diagonal negative — it is " +
        "a SCORE, monotone-faithful at matrix scale, not a certified " +
        "lower bound). Plan: ONE token-grain groupBy(lang, token) " +
        "builds every LM (localCheckpoint — it feeds the totals, the " +
        "a-side, and the b-side); Na/V live on a 5-row broadcast " +
        "frame; the b-side attaches by token equi-join after a " +
        "crossJoin with the BROADCAST 5-row lang domain (vocab x 5 " +
        "rows, bounded); the matrix rollup lands on the 25-pair " +
        "domain. 100 TB: the corpus is touched once, everything " +
        "after is vocab-scale.",
      (s, dir) => {
        import s.implicits._
        val cnt = Tables.t(s, dir, "documents")
          .select($"lang", explode(split(trim($"text"), " ")).as("token"))
          .groupBy($"lang", $"token").agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val tots = cnt.groupBy($"lang").agg(sum($"c").as("n"))
          .localCheckpoint(true)
        val v = broadcast(cnt.agg(
          countDistinct($"token").as("v_size")))
        def hb(x: String) = s"(length(bin(($x) * ($x))) - 1)"
        val aSide = cnt.select($"lang".as("lang_a"), $"token", $"c")
        val bSide = cnt.select($"lang".as("lang_b"), $"token",
          $"c".as("cb"))
        aSide.crossJoin(broadcast(tots.select($"lang".as("lang_b"))))
          .join(bSide, Seq("lang_b", "token"), "left")
          .withColumn("cb", coalesce($"cb", lit(0L)))
          .groupBy($"lang_a", $"lang_b")
          .agg(expr(s"cast(sum(c * (${hb("c")} - ${hb("cb + 1")})) " +
            "as bigint)").as("term_hb"))
          .join(broadcast(tots.select($"lang".as("la2"),
            $"n".as("na"))), $"lang_a" === $"la2")
          .join(broadcast(tots.select($"lang".as("lang_b"),
            $"n".as("nb"))), Seq("lang_b"))
          .crossJoin(v)
          .select($"lang_a", $"lang_b", $"na".as("n_tokens_a"),
            expr(s"cast(term_hb + na * (${hb("nb + v_size")} - " +
              s"${hb("na")}) as bigint)").as("kl_hb"))
          .withColumn("kl_millibits_per_token", expr(
            "cast(case when kl_hb < 0 " +
              "then -((-kl_hb) * 500 div n_tokens_a) " +
              "else kl_hb * 500 div n_tokens_a end as bigint)"))
          .orderBy($"lang_a", $"lang_b")
      },
      Some("""
        WITH tok AS (SELECT lang,
               unnest(string_split(trim(text), ' ')) AS token
             FROM documents),
        cnt AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY 1, 2),
        tots AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n
                 FROM cnt GROUP BY 1),
        v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v_size
              FROM cnt),
        pair AS (
          SELECT a.lang AS lang_a, lb.lang AS lang_b, a.token,
                 a.c, coalesce(b.c, 0) AS cb
          FROM cnt a
          CROSS JOIN (SELECT lang FROM tots) lb
          LEFT JOIN cnt b ON b.lang = lb.lang AND b.token = a.token),
        term AS (
          SELECT lang_a, lang_b,
                 CAST(sum(c * ((length(bin(c * c)) - 1)
                   - (length(bin((cb + 1) * (cb + 1))) - 1)))
                   AS BIGINT) AS term_hb
          FROM pair GROUP BY 1, 2)
        SELECT t.lang_a, t.lang_b, ta.n AS n_tokens_a,
               CAST(t.term_hb + ta.n *
                 ((length(bin((tb.n + v.v_size) * (tb.n + v.v_size)))
                   - 1) - (length(bin(ta.n * ta.n)) - 1)) AS BIGINT)
                 AS kl_hb,
               CAST(CASE WHEN t.term_hb + ta.n *
                 ((length(bin((tb.n + v.v_size) * (tb.n + v.v_size)))
                   - 1) - (length(bin(ta.n * ta.n)) - 1)) < 0
                 THEN -((-(t.term_hb + ta.n *
                   ((length(bin((tb.n + v.v_size) * (tb.n + v.v_size)))
                     - 1) - (length(bin(ta.n * ta.n)) - 1)))) * 500
                   // ta.n)
                 ELSE (t.term_hb + ta.n *
                   ((length(bin((tb.n + v.v_size) * (tb.n + v.v_size)))
                     - 1) - (length(bin(ta.n * ta.n)) - 1))) * 500
                   // ta.n END AS BIGINT) AS kl_millibits_per_token
        FROM term t
        JOIN tots ta ON t.lang_a = ta.lang
        JOIN tots tb ON t.lang_b = tb.lang
        CROSS JOIN v
        ORDER BY t.lang_a, t.lang_b""")),

    Q(
      "q347_pmi_collocations",
      "PMI COLLOCATION MINING — the corpus-linguistics classic " +
        "(Church & Hanks 1990) that surfaces multiword units before " +
        "tokenizer training decides what deserves a merge: top-20 " +
        "adjacent bigrams by pointwise mutual information " +
        "log2(P(ab) / (P(a)P(b))) with the standard min-count floor " +
        "(c_ab >= 5, killing the rare-pair PMI explosion). Quantized " +
        "to the q336/q341 half-bit family TERM BY TERM — pmi_hb = " +
        "hb(c_ab) + 2*hb(N) - hb(B) - hb(c_a) - hb(c_b), each factor " +
        "squared separately so nothing overflows BIGINT at any " +
        "corpus size (the fused product c_ab*N^2 squared would " +
        "overflow past ~55k tokens). Differs from q127 (per-doc " +
        "bigram-rarity quality score) — this ranks the GLOBAL pair " +
        "inventory. Plan: unigram and bigram counts are two " +
        "token-grain aggregates (map-side combine eats the Zipf " +
        "head); N and B are 1-row broadcasts of those frames " +
        "(localCheckpoint — each feeds its total and a join); the " +
        "unigram frame joins back twice (token_a, token_b); the " +
        "rank window runs AFTER orderBy+limit(20).",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        def hb(x: String) = s"(length(bin(($x) * ($x))) - 1)"
        val arr = Tables.t(s, dir, "documents")
          .select(split(trim($"text"), " ").as("t"))
        val uni = arr.select(explode($"t").as("token"))
          .groupBy($"token").agg(count(lit(1)).as("ca"))
          .localCheckpoint(true)
        val nTok = broadcast(uni.agg(sum($"ca").as("n_tok")))
        val big = arr.select(explode(expr(
            "case when size(t) >= 2 then transform(sequence(1, " +
              "size(t) - 1), i -> struct(element_at(t, i) as ta, " +
              "element_at(t, i + 1) as tb)) " +
              "else array() end")).as("p"))
          .select($"p.ta", $"p.tb")
          .groupBy($"ta", $"tb").agg(count(lit(1)).as("cab"))
          .localCheckpoint(true)
        val nBig = broadcast(big.agg(sum($"cab").as("n_big")))
        big.filter($"cab" >= 5)
          .join(uni.select($"token".as("ta"), $"ca"), Seq("ta"))
          .join(uni.select($"token".as("tb"), $"ca".as("cb")),
            Seq("tb"))
          .crossJoin(nTok).crossJoin(nBig)
          .select($"ta", $"tb", $"cab",
            expr(s"cast(${hb("cab")} + 2 * ${hb("n_tok")} - " +
              s"${hb("n_big")} - ${hb("ca")} - ${hb("cb")} " +
              "as bigint)").as("pmi_hb"))
          .orderBy($"pmi_hb".desc, $"ta", $"tb").limit(20)
          .withColumn("rk", row_number().over(
            Window.orderBy($"pmi_hb".desc, $"ta", $"tb")).cast("long"))
          .select($"rk", $"ta", $"tb", $"cab", $"pmi_hb")
          .orderBy($"rk")
      },
      Some("""
        WITH a AS (SELECT string_split(trim(text), ' ') AS ws
                   FROM documents),
        uni AS (SELECT token, CAST(count(*) AS BIGINT) AS ca
                FROM (SELECT unnest(ws) AS token FROM a) GROUP BY 1),
        nt AS (SELECT CAST(sum(ca) AS BIGINT) AS n_tok FROM uni),
        bigr AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS cab
                 FROM (SELECT ws[i] AS ta, ws[i + 1] AS tb
                       FROM (SELECT ws, unnest(range(1, len(ws))) AS i
                             FROM a WHERE len(ws) >= 2))
                 GROUP BY 1, 2),
        nb AS (SELECT CAST(sum(cab) AS BIGINT) AS n_big FROM bigr),
        sc AS (
          SELECT b.ta, b.tb, b.cab,
                 CAST((length(bin(b.cab * b.cab)) - 1)
                   + 2 * (length(bin(nt.n_tok * nt.n_tok)) - 1)
                   - (length(bin(nb.n_big * nb.n_big)) - 1)
                   - (length(bin(ua.ca * ua.ca)) - 1)
                   - (length(bin(ub.ca * ub.ca)) - 1) AS BIGINT)
                   AS pmi_hb
          FROM bigr b
          JOIN uni ua ON b.ta = ua.token
          JOIN uni ub ON b.tb = ub.token
          CROSS JOIN nt CROSS JOIN nb
          WHERE b.cab >= 5),
        r AS (SELECT CAST(row_number() OVER
                (ORDER BY pmi_hb DESC, ta, tb) AS BIGINT) AS rk,
                ta, tb, cab, pmi_hb
              FROM sc)
        SELECT rk, ta, tb, cab, pmi_hb FROM r WHERE rk <= 20
        ORDER BY rk""")),

    Q(
      "q354_gopher_quality_rules",
      "GOPHER-STYLE RULE-BASED QUALITY FILTER AUDIT (Rae et al. 2021 " +
        "appendix A1.1, the rule battery every LLM corpus pass starts " +
        "with, re-bounded to the fixture's 10-99-word documents): five " +
        "per-doc rules — word count in [20,80], mean word length in " +
        "[3,10] (cross-multiplied 3n <= sumlen <= 10n, no division), " +
        ">= 2 English stopword hits (the shared q51/q52 list), " +
        "type-token ratio >= 0.3 (10*distinct >= 3*n), and " +
        "top-token share <= 10% (10*maxcnt <= n). Output is the AUDIT, " +
        "not the filtered corpus (q129's funnel discipline): one row " +
        "per rule with failing-doc counts + the pass_all row, shares " +
        "in ppm — the numbers a data curator reads before committing " +
        "a filter threshold. All five rules are computed in ONE " +
        "codegen'd projection over array HOFs (the per-doc top-token " +
        "count is array_max over transform(distinct, count-in-doc) — " +
        "bounded by the 99-token doc length, no explode, no shuffle); " +
        "the aggregate is a 1-row reduce unpivoted by stack onto the " +
        "6-row rule domain. 100 TB: a map-only pass + one tiny reduce.",
      (s, dir) => {
        import s.implicits._
        val en = stopwords.head._2
        val d = Tables.t(s, dir, "documents").select(
          size(toks).as("n"),
          expr("aggregate(transform(split(trim(text), ' '), " +
            "x -> length(x)), 0, (a, b) -> a + b)").as("sumlen"),
          size(filter(toks, x => array_contains(typedLit(en), x)))
            .as("stophits"),
          size(array_distinct(toks)).as("dist"),
          expr("array_max(transform(array_distinct(split(trim(text), " +
            "' ')), t -> size(filter(split(trim(text), ' '), " +
            "x -> x = t))))").as("maxcnt"))
          .select(
            ($"n" >= 20 && $"n" <= 80).as("p1"),
            ($"sumlen" >= $"n" * 3 && $"sumlen" <= $"n" * 10).as("p2"),
            ($"stophits" >= 2).as("p3"),
            ($"dist" * 10 >= $"n" * 3).as("p4"),
            ($"maxcnt" * 10 <= $"n").as("p5"))
        d.agg(
            sum((!$"p1").cast("long")).as("f1"),
            sum((!$"p2").cast("long")).as("f2"),
            sum((!$"p3").cast("long")).as("f3"),
            sum((!$"p4").cast("long")).as("f4"),
            sum((!$"p5").cast("long")).as("f5"),
            sum(($"p1" && $"p2" && $"p3" && $"p4" && $"p5")
              .cast("long")).as("pall"),
            count(lit(1)).as("total"))
          .selectExpr("stack(6, " +
            "'fail_word_count', f1, 'fail_mean_word_len', f2, " +
            "'fail_stopword_hits', f3, 'fail_type_token_ratio', f4, " +
            "'fail_top_token_share', f5, 'pass_all', pall) " +
            "as (rule, n_docs)", "total")
          .select($"rule", $"n_docs",
            expr("n_docs * 1000000 div total").as("share_ppm"))
          .orderBy($"rule")
      },
      Some(s"""
        WITH f AS (
          SELECT len(string_split(trim(text), ' ')) AS n,
                 CAST(list_sum(list_transform(string_split(trim(text),
                   ' '), x -> length(x))) AS BIGINT) AS sumlen,
                 len(list_filter(string_split(trim(text), ' '),
                   x -> list_contains(['the', 'a', 'and', 'of', 'to'],
                     x))) AS stophits,
                 len(list_distinct(string_split(trim(text), ' ')))
                   AS dist,
                 list_max(list_transform(list_distinct(
                   string_split(trim(text), ' ')),
                   t -> len(list_filter(string_split(trim(text), ' '),
                     x -> x = t)))) AS maxcnt
          FROM documents),
        p AS (
          SELECT (n >= 20 AND n <= 80) AS p1,
                 (sumlen >= n * 3 AND sumlen <= n * 10) AS p2,
                 (stophits >= 2) AS p3,
                 (dist * 10 >= n * 3) AS p4,
                 (maxcnt * 10 <= n) AS p5
          FROM f),
        a AS (
          SELECT CAST(sum(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f1,
                 CAST(sum(CASE WHEN NOT p2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f2,
                 CAST(sum(CASE WHEN NOT p3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f3,
                 CAST(sum(CASE WHEN NOT p4 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f4,
                 CAST(sum(CASE WHEN NOT p5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f5,
                 CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 AND p5
                   THEN 1 ELSE 0 END) AS BIGINT) AS pall,
                 CAST(count(*) AS BIGINT) AS total
          FROM p),
        u AS (
          SELECT 'fail_word_count' AS rule, f1 AS n_docs, total FROM a
          UNION ALL SELECT 'fail_mean_word_len', f2, total FROM a
          UNION ALL SELECT 'fail_stopword_hits', f3, total FROM a
          UNION ALL SELECT 'fail_type_token_ratio', f4, total FROM a
          UNION ALL SELECT 'fail_top_token_share', f5, total FROM a
          UNION ALL SELECT 'pass_all', pall, total FROM a)
        SELECT rule, n_docs,
               CAST(n_docs * 1000000 // total AS BIGINT) AS share_ppm
        FROM u ORDER BY rule""")),

    Q(
      "q365_bpe_train_merges",
      "FULL BPE TOKENIZER TRAINING LOOP (Sennrich et al. 2016) as a " +
        "first-class query — the 8-merge table learned from the " +
        "fixture corpus, in order: q141 is the pair-counting kernel " +
        "for ONE iteration; this runs the whole train loop via the " +
        "shared bpeTrain driver (count pairs -> collect the single " +
        "argmax winner [2-cell driver artifact, count desc + lexical " +
        "tie-break] -> re-symbolize with the codegen'd bpeApplyMerge " +
        "fold -> localCheckpoint so the plan stays one merge deep -> " +
        "repeat). Output: (iteration, a, b, n_merged_pair) — exactly " +
        "what ships to the tokenizer artifact store. PROMOTED round " +
        "12 from rows-only to a GENERATED oracle (q363's chained-CTE " +
        "discipline): the trainer is fully deterministic (exact " +
        "integer pair counts, count-desc + lexical-binary argmax), so " +
        "the oracle replays all 8 iterations as 8 CTE triples " +
        "(pair-count / 1-row argmax / re-symbolize). The one subtle " +
        "leg — the greedy LEFT-TO-RIGHT NON-OVERLAPPING merge fold — " +
        "maps exactly onto SQL replace() by encoding the symbol " +
        "sequence as per-symbol-delimited units (chr31+sym+chr31 " +
        "each; pattern [a][b] -> [ab]): replace() scans left to " +
        "right and resumes AFTER each replacement, precisely the " +
        "fold's greedy non-overlap semantics, and the per-symbol " +
        "wrapping makes cross-boundary false matches impossible " +
        "([a,b,a,b] merges twice; [xa,b] never matches). BpeSpec " +
        "still replays the merges against the independent in-memory " +
        "scanner. 100 TB: each iteration is one " +
        "map-side-combined pair count over the CURRENT symbol corpus " +
        "(shuffle bounded by the vocab-pair domain, never corpus " +
        "bytes) — the q150 snap-per-iteration discipline.",
      (s, dir) => {
        import s.implicits._
        bpeTrain(s, dir, nMerges = 8)
          .toDF("iteration", "a", "b", "n_merged_pair")
          .select($"iteration".cast("long").as("iteration"),
            $"a", $"b", $"n_merged_pair")
          .orderBy($"iteration")
      },
      Some(bpeTrainOracleSql(8))),

    Q(
      "q379_langid_confusion",
      "LANGUAGE-ID CONFUSION MATRIX — q51's classifier GRADED against " +
        "the labeled lang column (the eval q51's auditable scores " +
        "exist to feed; q318's agreement-matrix discipline applied to " +
        "the langid family): per (labeled, predicted) cell the doc " +
        "count and within-class share in ppm — the diagonal is " +
        "per-class recall, off-diagonal cells name WHICH languages " +
        "leak into which (the word-salad fixtures make en absorb " +
        "most of the mass; that asymmetry is the finding). The " +
        "decision rule is REPLAYED from q51 verbatim on integer hit " +
        "counts (same argmax — the shared per-doc denominator makes " +
        "ratio-argmax and count-argmax identical, and integers " +
        "cannot ULP-flip a tie). Plan: one codegen'd scoring " +
        "projection, one (5x6)-bounded cell aggregate, one " +
        "class-domain window. 100 TB: map-only + a 30-cell reduce.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        def h(i: Int) =
          size(filter(toks, x =>
            array_contains(typedLit(stopwords(i)._2), x)))
        val pred = Tables.t(s, dir, "documents")
          .select($"lang".as("labeled_lang"),
            h(0).as("h_en"), h(1).as("h_de"), h(2).as("h_es"),
            h(3).as("h_fr"), h(4).as("h_zh"))
          .select($"labeled_lang",
            when(greatest($"h_en", $"h_de", $"h_es", $"h_fr",
              $"h_zh") === 0, "und")
              .when($"h_en" >= greatest($"h_de", $"h_es", $"h_fr",
                $"h_zh"), "en")
              .when($"h_de" >= greatest($"h_es", $"h_fr", $"h_zh"),
                "de")
              .when($"h_es" >= greatest($"h_fr", $"h_zh"), "es")
              .when($"h_fr" >= $"h_zh", "fr")
              .otherwise("zh").as("predicted_lang"))
        val wClass = Window.partitionBy($"labeled_lang")
        pred.groupBy($"labeled_lang", $"predicted_lang")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("class_total", sum($"n_docs").over(wClass))
          .select($"labeled_lang", $"predicted_lang", $"n_docs",
            expr("n_docs * 1000000 div class_total")
              .as("class_share_ppm"))
          .orderBy($"labeled_lang", $"predicted_lang")
      },
      Some(s"""
        WITH pred AS (
          SELECT lang AS labeled_lang,
                 ${duckHits(stopwords(0)._2)} AS h_en,
                 ${duckHits(stopwords(1)._2)} AS h_de,
                 ${duckHits(stopwords(2)._2)} AS h_es,
                 ${duckHits(stopwords(3)._2)} AS h_fr,
                 ${duckHits(stopwords(4)._2)} AS h_zh
          FROM documents),
        cls AS (
          SELECT labeled_lang,
                 CASE WHEN greatest(h_en, h_de, h_es, h_fr, h_zh) = 0
                      THEN 'und'
                      WHEN h_en >= greatest(h_de, h_es, h_fr, h_zh)
                      THEN 'en'
                      WHEN h_de >= greatest(h_es, h_fr, h_zh) THEN 'de'
                      WHEN h_es >= greatest(h_fr, h_zh) THEN 'es'
                      WHEN h_fr >= h_zh THEN 'fr'
                      ELSE 'zh' END AS predicted_lang
          FROM pred),
        cells AS (
          SELECT labeled_lang, predicted_lang,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM cls GROUP BY 1, 2)
        SELECT labeled_lang, predicted_lang, n_docs,
               CAST(n_docs * 1000000 // sum(n_docs) OVER
                 (PARTITION BY labeled_lang) AS BIGINT)
                 AS class_share_ppm
        FROM cells ORDER BY labeled_lang, predicted_lang""")),

    Q(
      "q398_mcnemar_test",
      "McNEMAR'S PAIRED TEST (McNemar 1947 — THE test for 'is model A " +
        "actually better than model B on the same examples': only the " +
        "DISCORDANT pairs b = A-right-B-wrong and c = A-wrong-B-right " +
        "carry signal; accuracy deltas without it are the classic " +
        "eval mistake): model A = q51's stopword-hit language " +
        "classifier (replayed verbatim, q379's discipline), model B " +
        "= the majority-class baseline (predict 'en' always), truth " +
        "= the labeled lang column. The statistic (b-c)^2/(b+c) is " +
        "carried as the exact integer milli-rational and the 5% " +
        "decision vs chi-square(1) = 3.841 is ONE integer compare " +
        "((b-c)^2 * 1000 > 3841 * (b+c)) — no sqrt, no float, q208's " +
        "discipline. Plan: one scoring projection, one 4-cell " +
        "reduce, O(1) after. 100 TB: a billion graded examples " +
        "reduce to four counters.",
      (s, dir) => {
        import s.implicits._
        def h(i: Int) =
          size(filter(toks, x =>
            array_contains(typedLit(stopwords(i)._2), x)))
        Tables.t(s, dir, "documents")
          .select($"lang",
            h(0).as("h_en"), h(1).as("h_de"), h(2).as("h_es"),
            h(3).as("h_fr"), h(4).as("h_zh"))
          .select($"lang",
            when(greatest($"h_en", $"h_de", $"h_es", $"h_fr",
              $"h_zh") === 0, "und")
              .when($"h_en" >= greatest($"h_de", $"h_es", $"h_fr",
                $"h_zh"), "en")
              .when($"h_de" >= greatest($"h_es", $"h_fr", $"h_zh"),
                "de")
              .when($"h_es" >= greatest($"h_fr", $"h_zh"), "es")
              .when($"h_fr" >= $"h_zh", "fr")
              .otherwise("zh").as("pred"))
          .select(($"pred" === $"lang").as("a_ok"),
            ($"lang" === "en").as("b_ok"))
          .agg(count(lit(1)).as("n"),
            sum(($"a_ok" && $"b_ok").cast("long")).as("n_both"),
            sum(($"a_ok" && !$"b_ok").cast("long")).as("b"),
            sum((!$"a_ok" && $"b_ok").cast("long")).as("c"))
          .select($"n", $"n_both", $"b", $"c",
            expr("(b - c) * (b - c) * 1000 div nullif(b + c, 0)")
              .as("chi2_milli"),
            expr("cast((b - c) * (b - c) * 1000 > 3841 * (b + c) " +
              "as long)").as("significant_5pct"))
      },
      Some(s"""
        WITH pred AS (
          SELECT lang,
                 ${duckHits(stopwords(0)._2)} AS h_en,
                 ${duckHits(stopwords(1)._2)} AS h_de,
                 ${duckHits(stopwords(2)._2)} AS h_es,
                 ${duckHits(stopwords(3)._2)} AS h_fr,
                 ${duckHits(stopwords(4)._2)} AS h_zh
          FROM documents),
        cls AS (
          SELECT lang,
                 CASE WHEN greatest(h_en, h_de, h_es, h_fr, h_zh) = 0
                      THEN 'und'
                      WHEN h_en >= greatest(h_de, h_es, h_fr, h_zh)
                      THEN 'en'
                      WHEN h_de >= greatest(h_es, h_fr, h_zh) THEN 'de'
                      WHEN h_es >= greatest(h_fr, h_zh) THEN 'es'
                      WHEN h_fr >= h_zh THEN 'fr'
                      ELSE 'zh' END AS pred
          FROM pred),
        g AS (
          SELECT pred = lang AS a_ok, lang = 'en' AS b_ok FROM cls),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) FILTER (a_ok AND b_ok) AS BIGINT)
                   AS n_both,
                 CAST(count(*) FILTER (a_ok AND NOT b_ok) AS BIGINT)
                   AS b,
                 CAST(count(*) FILTER (NOT a_ok AND b_ok) AS BIGINT)
                   AS c
          FROM g)
        SELECT n, n_both, b, c,
               CAST((b - c) * (b - c) * 1000 // nullif(b + c, 0)
                 AS BIGINT) AS chi2_milli,
               CAST((b - c) * (b - c) * 1000 > 3841 * (b + c)
                 AS BIGINT) AS significant_5pct
        FROM agg""")),

    Q(
      "q453_aho_corasick_dictionary",
      "AHO-CORASICK DICTIONARY SCREENING (Aho & Corasick 1975) — the " +
        "multi-pattern kernel a corpus pipeline runs constantly " +
        "(blocklist terms, PII markers, license fragments, " +
        "contamination probes): the bounded dictionary compiles ONCE " +
        "on the driver into a dense byte-level DFA (fail links folded " +
        "into the transition table — no failure chain in the hot " +
        "loop), and each document is scanned in ONE pass emitting a " +
        "64-bit presence bitmask via a native codegen'd expression " +
        "(catalyst/AhoCorasickExpressions — one table read and one " +
        "mask OR per byte, inside WholeStageCodegen). The dictionary " +
        "deliberately exercises the automaton's sharing: nested " +
        "patterns ('scan' inside 'table scan', 'low' inside 'slow'), " +
        "cross-word phrases, a shared-prefix pair, and one absent " +
        "probe that must report zero. Per-pattern doc-frequencies are " +
        "decoded from the masks by a broadcast bit-test (integer ops " +
        "— the d x docs work here is bit probes, never string scans) " +
        "and EVERY count is recomputed independently by the oracle's " +
        "per-pattern instr() scan. AhoSpec additionally pins the mask " +
        "against a naive per-pattern contains() over the corpus. " +
        "100 TB: one DFA pass per document replaces d substring " +
        "scans — the factor-of-|dictionary| read-amplification " +
        "difference — with zero shuffle before the 63-key count.",
      (s, dir) => {
        import graft.catalyst.AhoCorasick
        import s.implicits._
        val pats = q453Patterns
        val masks = Tables.t(s, dir, "documents")
          .select(AhoCorasick.ac_mask($"text", pats).as("mask"))
        val patDf = pats.zipWithIndex.toDF("pattern", "pid")
        masks.join(broadcast(patDf))
          .groupBy($"pattern")
          .agg(sum(expr("shiftright(mask, pid) & 1")).as("n_docs"))
          .orderBy($"pattern")
      },
      Some(s"""
        SELECT pattern,
               CAST(sum(CASE WHEN instr(text, pattern) > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
        FROM (VALUES ${q453Patterns.map(p => s"('$p')").mkString(", ")})
          AS pats(pattern)
        CROSS JOIN documents
        GROUP BY pattern ORDER BY pattern"""))
  )

  /** q453's dictionary — nested patterns, cross-word phrases, a
    * shared-prefix pair, and an absent probe (no quotes/escapes: the
    * list is inlined into the oracle SQL as VALUES literals). */
  val q453Patterns: Seq[String] = Seq(
    "table scan", "scan", "slow", "low", "hash join", "join",
    "merge batch", "merge", "a row", "row fast", "fast", "value table",
    "never-in-corpus")

  /** Apply one BPE merge (a, b) -> a||b to a symbol array, greedy
    * left-to-right non-overlapping — the between-iterations step of a
    * BPE vocabulary trainer (q141 is the counting kernel run once per
    * merge; this is what the driver 'applies' before re-running it).
    * A pure built-in fold (functions.aggregate), so the merge pass stays
    * inside whole-stage codegen like the kernel itself: push each symbol;
    * when the accumulator's last symbol is `a` and the incoming is `b`,
    * replace the last with the merged symbol instead. The merged symbol
    * a||b can never equal `a` (b is non-empty), so a freshly merged
    * symbol cannot be re-merged as the LEFT half in the same pass —
    * which is exactly the greedy non-overlapping semantics; it CAN seed
    * the next pair as a left half once the next iteration's chosen pair
    * names it, matching reference BPE. */
  /** q279's fused retrieval, shared with q300's context assembly so the
    * retrieval convention cannot diverge from the packer that consumes
    * it: BM25 top-30 for {query, window, scan} fused with the cosine
    * top-30 to fixture probe vec_id=0 by exact integer RRF nanos
    * (1e9 div (60+rank)); returns the fused top-10 as
    * (doc_id, r_lex, r_sem, rrf_nano). The rank windows run over
    * <=30-row post-limit lists — the empty partitionBy is bounded by
    * construction, never corpus-wide. */
  def rrfTop10(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val lexTop = bm25Scores(s, dir, Seq("query", "window", "scan"))
      .orderBy($"bm25_micros".desc, $"doc_id").limit(30)
    val lex = lexTop
      .withColumn("r_lex", row_number()
        .over(Window.orderBy($"bm25_micros".desc, $"doc_id"))
        .cast("long"))
      .select($"doc_id", $"r_lex")
    val e = Tables.t(s, dir, "embeddings")
    val probe = e.filter($"vec_id" === 0)
      .select($"embedding".as("probe_vec"))
    val semTop = e.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("cos",
        round(graft.operators.Similarity.cosine($"embedding", $"probe_vec"), 6))
      .orderBy($"cos".desc, $"vec_id").limit(30)
    val sem = semTop
      .withColumn("r_sem", row_number()
        .over(Window.orderBy($"cos".desc, $"vec_id")).cast("long"))
      .select($"vec_id".as("doc_id"), $"r_sem")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_nano",
        coalesce(expr("1000000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000000 div (60 + r_sem)"), lit(0L)))
      .orderBy($"rrf_nano".desc, $"doc_id").limit(10)
      .select($"doc_id", $"r_lex", $"r_sem", $"rrf_nano")
  }

  /** Per-doc BM25 scores (k1=1.2, b=0.75, rational idf — the log dropped,
    * a monotone transform; see q165's doc) for the given query terms, as
    * order-independent integer micros: (doc_id, bm25_micros, n_terms).
    * ONE definition shared by q165 (ranked retrieval) and q279 (hybrid
    * RRF fusion) so the scoring convention cannot diverge between the
    * lexical leg's two consumers. Unordered and unlimited — callers
    * apply their own top-k tail. */
  def bm25Scores(s: org.apache.spark.sql.SparkSession, dir: String,
      terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val toks = Tables.t(s, dir, "documents")
      .select($"doc_id", explode(split(trim($"text"), " ")).as("w"))
      .filter($"w" =!= "")
    val lens = toks.groupBy($"doc_id").agg(count(lit(1)).as("len"))
    val corpus = lens.groupBy()
      .agg(count(lit(1)).as("n_docs"), sum($"len").as("sum_len"))
    val tf = toks.filter($"w".isin(terms: _*))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy($"w").agg(count(lit(1)).as("df"))
    tf.join(lens, Seq("doc_id"))
      .join(broadcast(idf), Seq("w"))
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", $"sum_len".cast("double") / $"n_docs")
      .withColumn("idf", ($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
      .withColumn("den",
        $"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * ($"len" / $"avgdl")))
      .withColumn("sc",
        floor((($"idf" * ($"tf" * lit(2.2))) / $"den") * lit(1000000.0)
          + lit(0.5)).cast("long"))
      .groupBy($"doc_id")
      .agg(sum($"sc").as("bm25_micros"), count(lit(1)).as("n_terms"))
  }

  def bpeApplyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent-pair counts over a symbol-array corpus — q141's kernel
    * generalized past iteration 1 (where symbols are single characters,
    * this reduces to q141's character-bigram count). Map-side generate;
    * the shuffle carries the current |vocab|^2-bounded pair domain with
    * map-side combine, never the corpus. */
  def bpePairCounts(corpus: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import corpus.sparkSession.implicits._
    val weighted =
      if (corpus.columns.contains("wcount")) corpus
      else corpus.withColumn("wcount", lit(1L))
    weighted.filter(size($"syms") >= 2)
      .select($"wcount", explode(expr(
        "transform(sequence(1, size(syms) - 1), j -> " +
          "struct(element_at(syms, j) AS a, element_at(syms, j + 1) AS b))"))
        .as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b"))
      .agg(sum($"wcount").as("n"))
  }

  /** The full multi-iteration BPE training loop: run the counting kernel,
    * collect the single winning pair (count desc, lexical tie-break — a
    * 2-cell driver artifact, not a corpus collect), apply the merge with
    * [[bpeApplyMerge]], localCheckpoint the re-symbolized corpus so the
    * plan stays one merge deep at any iteration count, repeat. Returns
    * (iteration, a, b, n_merged_pair) — the learned merge table, in
    * order. On a real cluster the corpus frame would persist to
    * disk-backed storage between iterations exactly like q150's
    * pagerankInt (same snap-per-iteration argument). */
  /** GENERATED DuckDB oracle replaying [[bpeTrain]]'s full nMerges-
    * iteration loop as chained CTEs (the q363/q378 generated-oracle
    * discipline — every step below is exact-integer or binary-collation
    * string logic, so the replay is bit-safe):
    *  - symbol sequences travel as strings of chr(31)-wrapped units
    *    (`[a][b][c]` for word "abc", where `[x]` = chr31 + x + chr31);
    *  - pair counting splits on the chr31-chr31 unit boundary and sums
    *    word frequencies (identical to bpePairCounts by linearity);
    *  - the winner is the same (n DESC, a, b) argmax — DuckDB's default
    *    VARCHAR collation is binary memcmp, the UTF8String order Spark
    *    sorts by;
    *  - applying a merge is ONE replace('[a][b]' -> '[ab]'): SQL
    *    replace scans left-to-right and resumes AFTER each replacement,
    *    which is exactly bpeApplyMerge's greedy non-overlapping fold,
    *    and the per-symbol wrapping makes a cross-symbol-boundary match
    *    impossible ("xa","b" does not contain '[a][b]'). */
  def bpeTrainOracleSql(nMerges: Int): String = {
    def unit(x: String) = s"chr(31) || $x || chr(31)"
    def it(i: Int): String = s"""
      p$i AS (
        SELECT pr.a, pr.b, CAST(sum(wcount) AS BIGINT) AS n
        FROM (
          SELECT wcount,
                 unnest([struct_pack(a := syms[j], b := syms[j+1])
                         for j in range(1, len(syms))]) AS pr
          FROM (SELECT string_split(substr(s, 2, len(s) - 2),
                         chr(31) || chr(31)) AS syms, wcount
                FROM c${i - 1}) t
          WHERE len(syms) >= 2) u
        GROUP BY pr.a, pr.b),
      w$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
      c$i AS MATERIALIZED (
        SELECT replace(s, ${unit("w.a")} || ${unit("w.b")},
                       ${unit("w.a || w.b")}) AS s, wcount
        FROM c${i - 1}, w$i w)"""
    s"""
      WITH words AS (
        SELECT word, CAST(count(*) AS BIGINT) AS wcount
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS word
              FROM documents)
        WHERE len(word) >= 2 GROUP BY word),
      c0 AS MATERIALIZED (
        SELECT chr(31) ||
               array_to_string([word[j] for j in range(1, len(word) + 1)],
                               chr(31) || chr(31)) || chr(31) AS s,
               wcount
        FROM words),
      ${(1 to nMerges).map(it).mkString(",")}
      SELECT * FROM (${(1 to nMerges).map(i =>
        s"SELECT CAST($i AS BIGINT) AS iteration, a, b, " +
          s"CAST(n AS BIGINT) AS n_merged_pair FROM w$i")
        .mkString(" UNION ALL ")})
      ORDER BY iteration"""
  }

  def bpeTrain(s: org.apache.spark.sql.SparkSession, dir: String,
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    import s.implicits._
    // Train on word TYPES weighted by frequency — the textbook BPE
    // trainer shape (Sennrich's own implementation trains on the word-
    // frequency dict): pair totals are identical to the per-occurrence
    // fold by linearity, but each iteration now touches |vocab| rows
    // instead of |corpus| words. Measured at sf0.1: 22.2 s -> well
    // under 2 s for the same 8-merge table.
    var corpus = Tables.t(s, dir, "documents")
      .select(explode(split(trim($"text"), " ")).as("word"))
      .filter(length($"word") >= 2)
      .groupBy($"word").agg(count(lit(1)).as("wcount"))
      .select(expr(
        "transform(sequence(1, length(word)), j -> substring(word, j, 1))")
        .as("syms"), $"wcount")
      .localCheckpoint(true)
    (1 to nMerges).map { it =>
      val top = bpePairCounts(corpus)
        .orderBy($"n".desc, $"a", $"b").limit(1).collect()
      require(top.nonEmpty, s"BPE iteration $it: corpus has no adjacent pairs")
      val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      corpus = corpus.select(bpeApplyMerge($"syms", a, b).as("syms"),
          $"wcount")
        .localCheckpoint(true)
      (it, a, b, n)
    }
  }
}
