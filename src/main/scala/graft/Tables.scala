package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * Always read via `spark.read.parquet` so Catalyst owns pushdown: filters
  * and projections land in the scan (`PushedFilters` / `ReadSchema`), which
  * is the property that survives a 100 TB scale-up — never pre-collect.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize per (session, dir, table): schema/footer discovery is pure
  // driver-side overhead that would otherwise be paid on every query.
  // Keyed by the session OBJECT (reference equality — unlike an identity
  // hash, two live sessions can never collide). Weak keys would not help
  // here: the cached DataFrames strongly reference their own session, so
  // eviction must be explicit — stopped sessions are pruned on access.
  private final class PerSession {
    val frames = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
    val registeredDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  }
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, PerSession]()
  private def perSession(spark: SparkSession): PerSession = {
    sessions.keySet.removeIf(s => (s ne spark) && s.sparkContext.isStopped)
    sessions.computeIfAbsent(spark, _ => new PerSession)
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    perSession(spark).frames.computeIfAbsent((dir, name), _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark reads only as a
    // nanos LongType (spark.sql.legacy.parquet.nanosAsLong, set in
    // GraftSession). Truncate to µs and expose as TIMESTAMP_NTZ so it
    // behaves like every other fixture timestamp (oracle casts to µs too).
    if (name == "events")
      raw.withColumn(
        "ts",
        org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    else raw
  }

  /** Register every fixture table as a temp view (for spark.sql corpora).
    * Re-registering identical views per query is wasted driver work, so
    * each session tracks which dirs it has already registered. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (perSession(spark).registeredDirs.add(dir))
      all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
