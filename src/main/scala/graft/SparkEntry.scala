package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every capability module's declared queries into the
  * name→query and name→oracle maps the driver's correctness gate consumes.
  */
object SparkEntry {

  /** All capability modules, in SURVEY.md §2 order. */
  val modules: Seq[QueryModule] = Seq(
    graft.operators.CoreRelational,
    graft.operators.Joins,
    graft.operators.WindowOps,
    graft.operators.SetSortOps,
    graft.functions.ScalarFuncs,
    graft.operators.SqlFeatures,
    graft.operators.AdvancedOps,
    graft.operators.AnalyticsPatterns,
    graft.operators.GraphSelection,
    graft.operators.Experimentation,
    graft.operators.SequentialOps,
    graft.operators.FeaturePlatform,
    graft.functions.TextAnalysis,
    graft.operators.Dedup,
    graft.operators.Similarity,
    graft.streaming.StreamingOps,
    graft.sources.IngestOps,
    graft.sources.SourceFormats,
    graft.operators.Multimodal)

  val allQueries: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse multi-line SQL to one line (stable JSON, driver-friendly). */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
