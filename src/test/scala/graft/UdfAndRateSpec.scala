package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two remaining SURVEY §2B surface rows not exercised elsewhere:
  * scalar UDF registration (supported but deliberately unused in the
  * corpus — native expressions/functions are the engine's path) and the
  * rate streaming test source.
  */
class UdfAndRateSpec extends AnyFunSuite {
  import TestSession._

  test("scalar UDF registers and runs (Column + SQL)") {
    import spark.implicits._
    val tokenBucket = udf((s: String) => s.split(" ").length / 5)
    spark.udf.register("token_bucket", tokenBucket)
    val viaColumn = Tables.t(spark, sfDir, "documents")
      .select(tokenBucket($"text").as("b")).groupBy($"b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      "SELECT token_bucket(text) AS b, count(*) AS n FROM documents GROUP BY 1")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaColumn === viaSql)
    assert(viaColumn.values.sum === 500)
  }

  test("rate streaming source produces monotonically increasing values") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "50").load()
      .writeStream.format("memory").queryName("rate_probe").start()
    try {
      val deadline = System.nanoTime() + 20L * 1000000000L
      while (spark.table("rate_probe").count() < 10 && System.nanoTime() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    val vals = spark.table("rate_probe").select("value")
      .collect().map(_.getLong(0)).sorted
    assert(vals.length >= 10)
    assert(vals.toSeq === (vals.min to vals.max).toSeq, "gap-free sequence")
  }
}
