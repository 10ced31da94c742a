package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The CDC change-set algebra every snapshot-store lifecycle query
  * drives (q432/q435/q436/q437/q438/q439 and the copy-on-write tier),
  * defined ONCE — before round 13 the same +7/retract/+11/insert
  * construction was inlined per query and mirrored per oracle, which
  * is exactly how fixture algebra drifts (round-13 verdict item 6).
  *
  * The algebra over `orders` at integer-cents grain:
  *   - batch 0: the %%10==[[updLowTranche]] tranche gets a
  *     +[[updLow]]-cent correction; the %%10==[[delTranche]] tranche
  *     is retracted.
  *   - batch 1: the %%10==[[updHighTranche]] tranche gets
  *     +[[updHigh]] cents; [[nInserts]] fresh rows insert above the
  *     key domain at [[insertCents]] into the '[[insertPrio]]' group.
  *   - the single-batch shape (q432/q438/q439): batch 0's corrections
  *     plus the inserts.
  *
  * Spark builders emit CDC rows WITH before/after images — what the
  * delta algebra (and any real CDC source: Debezium, a binlog) needs;
  * [[toMerge]] collapses images to the merge verb's shape. The DuckDB
  * side of the same algebra comes from ONE generator
  * ([[oracleStateCte]]), so engine and oracle share literals by
  * construction. */
object CdcFixture {

  val updLowTranche = 5
  val updLow = 7L
  val delTranche = 6
  val updHighTranche = 7
  val updHigh = 11L
  val insertCents = 99999L
  val insertPrio = "1-URGENT"
  val nInserts = 3

  /** orders at the CDC grain: (doc_id, cents, prio). Queries that
    * store a narrower schema project it down. */
  def orders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders").select(
      $"o_orderkey".as("doc_id"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
      $"o_orderpriority".as("prio"))
  }

  def maxKey(o: DataFrame): Long =
    o.agg(max(col("doc_id"))).head().getLong(0)

  /** Batch 0 with before/after images:
    * (op, doc_id, prio, old_cents, new_cents). */
  def batch0(o: DataFrame): DataFrame =
    o.filter(col("doc_id") % 10 === updLowTranche)
      .select(lit("update").as("op"), col("doc_id"), col("prio"),
        col("cents").as("old_cents"),
        (col("cents") + updLow).as("new_cents"))
      .unionByName(o.filter(col("doc_id") % 10 === delTranche)
        .select(lit("delete").as("op"), col("doc_id"), col("prio"),
          col("cents").as("old_cents"),
          lit(null).cast("long").as("new_cents")))

  /** The [[nInserts]] fresh rows above the key domain. */
  def inserts(s: SparkSession, mx: Long): DataFrame = {
    import s.implicits._
    (1 to nInserts).map(i => mx + i).toDF("doc_id")
      .select(lit("insert").as("op"), $"doc_id",
        lit(insertPrio).as("prio"),
        lit(null).cast("long").as("old_cents"),
        lit(insertCents).as("new_cents"))
  }

  /** Batch 1 with before/after images: the +[[updHigh]] tranche plus
    * the inserts. */
  def batch1(o: DataFrame, mx: Long): DataFrame =
    o.filter(col("doc_id") % 10 === updHighTranche)
      .select(lit("update").as("op"), col("doc_id"), col("prio"),
        col("cents").as("old_cents"),
        (col("cents") + updHigh).as("new_cents"))
      .unionByName(inserts(o.sparkSession, mx))

  /** The single-batch shape (q432/q438/q439): batch 0 + inserts. */
  def singleBatch(o: DataFrame, mx: Long): DataFrame =
    batch0(o).unionByName(inserts(o.sparkSession, mx))

  /** TINY batch for the copy-on-write tier (file reuse only shows when
    * |delta keys| << nShards): the 2 LOWEST %%10==[[updLowTranche]]
    * keys corrected by +[[updLow]], the lowest %%10==[[delTranche]]
    * key retracted, plus the [[nInserts]] inserts — 6 keys total,
    * deterministic at every scale factor. */
  def tinyBatch(o: DataFrame, mx: Long): DataFrame =
    o.filter(col("doc_id") % 10 === updLowTranche)
      .orderBy(col("doc_id")).limit(2)
      .select(lit("update").as("op"), col("doc_id"), col("prio"),
        col("cents").as("old_cents"),
        (col("cents") + updLow).as("new_cents"))
      .unionByName(o.filter(col("doc_id") % 10 === delTranche)
        .orderBy(col("doc_id")).limit(1)
        .select(lit("delete").as("op"), col("doc_id"), col("prio"),
          col("cents").as("old_cents"),
          lit(null).cast("long").as("new_cents")))
      .unionByName(inserts(o.sparkSession, mx))

  /** Second tiny batch: +[[updHigh]] on exactly the keys [[tinyBatch]]
    * left in place (its 2 updated keys and its 3 inserts) — the SAME
    * key set, so a store that merged both batches references the first
    * merge's file group from NO surviving shard, which is what lets
    * the ref-counted GC demonstrably collect it (q441). */
  def tinyBatch2(o: DataFrame, mx: Long): DataFrame = {
    val s = o.sparkSession
    import s.implicits._
    o.filter(col("doc_id") % 10 === updLowTranche)
      .orderBy(col("doc_id")).limit(2)
      .select(lit("update").as("op"), col("doc_id"), col("prio"),
        (col("cents") + updLow).as("old_cents"),
        (col("cents") + updLow + updHigh).as("new_cents"))
      .unionByName((1 to nInserts).map(i => mx + i).toDF("doc_id")
        .select(lit("update").as("op"), $"doc_id",
          lit(insertPrio).as("prio"),
          lit(insertCents).as("old_cents"),
          lit(insertCents + updHigh).as("new_cents")))
  }

  /** Collapse an image frame to the merge verb's shape:
    * (op, doc_id, cents[, prio]). */
  def toMerge(b: DataFrame, withPrio: Boolean = false): DataFrame = {
    val base = b.select(col("op"), col("doc_id"),
      coalesce(col("new_cents"), col("old_cents")).as("cents"),
      col("prio"))
    if (withPrio) base else base.drop("prio")
  }

  /** DuckDB CTE fragment for the POST-CHANGE state, appended after a
    * caller-defined `o AS (SELECT … AS k, … AS c[, … AS p] FROM
    * orders)` CTE: emits `, mxx AS (…)` (only when `withInserts` —
    * callers needing `mxx` elsewhere order their CTEs after this
    * fragment) `, <name> AS (rows after the changes)` with columns
    * ([p,] k, c). `b1` applies batch 1's +[[updHigh]] tranche;
    * `withInserts` appends the insert rows. The one place the change
    * algebra exists in SQL — q432/q435/q436/q437/q439 compose it. */
  def oracleStateCte(name: String, b1: Boolean, withInserts: Boolean,
      prio: Boolean): String = {
    val p = if (prio) "p, " else ""
    val upd7 =
      if (b1) s"\n                 WHEN k % 10 = $updHighTranche " +
        s"THEN c + $updHigh"
      else ""
    val mxx =
      if (withInserts) "\n        mxx AS (SELECT max(k) AS mx FROM o),"
      else ""
    val ins =
      if (withInserts)
        s"""
          UNION ALL
          SELECT ${if (prio) s"'$insertPrio', " else ""}mx + i, $insertCents
          FROM mxx
          CROSS JOIN (SELECT unnest([${(1 to nInserts).mkString(", ")}]) AS i)"""
      else ""
    s""",$mxx
        $name AS (
          SELECT ${p}k,
                 CASE WHEN k % 10 = $updLowTranche THEN c + $updLow$upd7
                      ELSE c END AS c
          FROM o WHERE k % 10 <> $delTranche$ins)"""
  }

  /** DuckDB CTE fragment for the POST-[[tinyBatch]] state (and, with
    * `withSecond`, post-[[tinyBatch2]]) over a caller-defined
    * `o(k, c)` CTE. Emits helper CTEs callers may reference:
    * `<name>_uk` (the 2 updated keys), `<name>_dk` (the retracted
    * key), `<name>_mx` (max key). */
  def oracleTinyStateCte(name: String, withSecond: Boolean): String = {
    val bump = if (withSecond) s" + $updHigh" else ""
    s""",
        ${name}_uk AS (
          SELECT k FROM o WHERE k % 10 = $updLowTranche
          ORDER BY k LIMIT 2),
        ${name}_dk AS (
          SELECT k FROM o WHERE k % 10 = $delTranche
          ORDER BY k LIMIT 1),
        ${name}_mx AS (SELECT max(k) AS mx FROM o),
        $name AS (
          SELECT k,
                 CASE WHEN k IN (SELECT k FROM ${name}_uk)
                      THEN c + $updLow$bump ELSE c END AS c
          FROM o WHERE k NOT IN (SELECT k FROM ${name}_dk)
          UNION ALL
          SELECT mx + i, $insertCents$bump
          FROM ${name}_mx
          CROSS JOIN (SELECT unnest([${(1 to nInserts).mkString(", ")}]) AS i))"""
  }
}
