package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout pruning: a predicate on the partition column must be
  * answered from directory listing alone (PartitionFilters), reading only
  * the matching partitions — at 100 TB the difference between scanning
  * 1/N of the lake and all of it.
  */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSession._

  test("hive-style partitioned write + partition-pruned read") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    Tables.t(spark, sfDir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(root)

    val pruned = spark.read.parquet(root)
      .filter($"event_type" === "error")
      .agg(count(lit(1)).as("n"))
    val n = pruned.collect()(0).getLong(0)
    val expected = Tables.t(spark, sfDir, "events")
      .filter($"event_type" === "error").count()
    assert(n === expected)

    val plan = pruned.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("PartitionFilters") && scanLine.contains("event_type"),
      scanLine)
    // the data filter must NOT appear as a row-level filter — pruning
    // answered it entirely from the directory layout
    assert(!plan.contains("Filter (isnotnull(event_type"), "expected no row-level filter")
  }
}
