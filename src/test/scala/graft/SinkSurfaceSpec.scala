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
