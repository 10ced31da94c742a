package graft

import graft.sink.{Fanout, IdempotentParquetSink}
import graft.sources.{OpenSky, OpenSkyHttpSource, SourceRegistry}
import graft.streaming.SyntheticOpenSkySource
import org.scalatest.funsuite.AnyFunSuite

/** A14 registry contract + effectively-once batch replay. */
class RegistryAndIdempotenceSpec extends AnyFunSuite {
  import TestSession._

  test("registry resolves by name; unknown names fail fast") {
    val s = SourceRegistry.resolve("opensky", Map("statesPerTick" -> "7"))
    assert(s.isInstanceOf[SyntheticOpenSkySource])
    assert(s.tablePrefix === "flights")
    val http = SourceRegistry.resolve("opensky",
      Map("url" -> "http://127.0.0.1:1/x", "user" -> "u", "password" -> "p"))
    assert(http.isInstanceOf[OpenSkyHttpSource])
    val e = intercept[IllegalArgumentException](SourceRegistry.resolve("nope"))
    assert(e.getMessage.contains("unknown ingest source") &&
      e.getMessage.contains("opensky"))
  }

  test("custom sources register and resolve (plugin Register parity)") {
    SourceRegistry.register("fixture-test", opts =>
      new SyntheticOpenSkySource(opts.getOrElse("n", "1").toInt))
    try {
      assert(SourceRegistry.names.contains("fixture-test"))
      assert(SourceRegistry.resolve("fixture-test", Map("n" -> "3")).name === "opensky")
    } finally SourceRegistry.deregister("fixture-test") // keep global state pristine
  }

  test("idempotent sink: replayed batch replaces instead of duplicating") {
    val root = java.nio.file.Files.createTempDirectory("graft_idem").toString
    val sink = new IdempotentParquetSink(root)
    val df = OpenSky.parseJson(spark, Seq(OpenSky.sampleResponse(10))).toDF()
    val targets = Seq(("db1", "flights"))
    Fanout.writeBatch(df, targets, sink, batchId = 0)
    // replay the SAME batch id (post-crash foreachBatch re-delivery)
    Fanout.writeBatch(df, targets, sink, batchId = 0)
    assert(spark.read.parquet(s"$root/db1/flights").count() === 10) // not 20
    // a new batch id appends
    Fanout.writeBatch(df, targets, sink, batchId = 1)
    assert(spark.read.parquet(s"$root/db1/flights").count() === 20)
  }
}
