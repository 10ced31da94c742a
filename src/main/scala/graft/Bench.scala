package graft

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds (driver contract). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create()
    // Warm the JVM/codegen paths once so per-query numbers measure the
    // engine, not first-call classloading.
    SparkEntry.entry(spark).count()
    // Two timed runs per query, report the minimum: run 1 pays one-off
    // driver costs (file listing, codegen compile); the min reflects
    // steady-state engine throughput.
    def once(q: Q): Double = {
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    val results = SparkEntry.allQueries.map { q =>
      val (a, b) = (once(q), once(q))
      q.name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Emit on three channels so sbt log interleaving can't lose the line:
    // bare JSON (original contract), a grep-able marker, and a file.
    println(json)
    println(s"GRAFT_BENCH_JSON $json")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      // the printed lines above are the primary contract; a bad BENCH_OUT
      // path must not fail a completed benchmark run
      case e: java.io.IOException =>
        System.err.println(s"bench: could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
