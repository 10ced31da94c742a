package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Operability-parity sinks beyond parquet/JDBC/memory (SURVEY §2B sinks
  * row): the console streaming sink and the catalog-table (`saveAsTable`)
  * batch path.
  */
class SinkSurfaceSpec extends AnyFunSuite {
  import TestSession._

  test("console sink runs a streaming micro-batch lifecycle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "name")
      .writeStream.outputMode("append").format("console")
      .option("numRows", "5").option("truncate", "true")
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
      assert(q.lastProgress != null)
      assert(q.recentProgress.map(_.numInputRows).sum === 3L)
    } finally q.stop()
  }

  test("observe() exposes per-query row/value metrics on batch and streaming") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // batch: metrics ride the executed plan — the engine-native form of
    // the reference's rows-per-tick logging (no second count() job)
    val batch = Seq((1L, 2.0), (2L, 3.5)).toDF("k", "v")
      .observe("stats", count(lit(1)).as("rows"), sum($"v").as("v_sum"))
    batch.collect()
    val m = batch.queryExecution.observedMetrics("stats")
    assert(m.getAs[Long]("rows") === 2L)
    assert(m.getAs[Double]("v_sum") === 5.5)

    // streaming: same API, surfaced through progress events
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDF().toDF("k")
      .observe("flow", count(lit(1)).as("rows"))
      .writeStream.outputMode("append").format("memory")
      .queryName("observe_stream").start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val rows = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("flow")).map(_.getAs[Long]("rows"))).sum
      assert(rows === 3L)
    } finally q.stop()
  }

  test("saveAsTable writes a catalog table readable by name and by SQL") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.5), (2L, "y", 4.0)).toDF("k", "tag", "v")
    df.write.mode("overwrite").saveAsTable("graft_catalog_demo")
    try {
      assert(spark.catalog.tableExists("graft_catalog_demo"))
      assert(spark.table("graft_catalog_demo").count() === 2L)
      val total = spark.sql("SELECT sum(v) AS s FROM graft_catalog_demo")
        .collect().head.getDouble(0)
      assert(total === 6.5)
      // append mode accumulates — the JDBC/parquet AppendSink semantics,
      // through the catalog
      df.write.mode("append").saveAsTable("graft_catalog_demo")
      assert(spark.table("graft_catalog_demo").count() === 4L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_catalog_demo")
  }
}
