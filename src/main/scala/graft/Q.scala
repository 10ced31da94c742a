package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named Spark query over the fixture
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle SQL.
  *
  * Contract (driver-enforced): the Spark result's column NAMES and value
  * representations must match the oracle's exactly — every computed column
  * is aliased identically on both sides, aggregate doubles are rounded on
  * both sides to absorb summation-order ULP drift, and BIGINT/INTEGER
  * widths are aligned with explicit casts in the oracle.
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A group of related capabilities (SURVEY.md §2 rows). */
trait QueryModule {
  def queries: Seq[Q]
}
