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
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name),
      _ => load(spark, dir, name))

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

  // Re-registering identical views per query is wasted driver work; track
  // which (session, dir) is already registered.
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()

  /** Register every fixture table as a temp view (for spark.sql corpora). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registered.add((System.identityHashCode(spark), dir)))
      all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
