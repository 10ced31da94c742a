package graft.tools

import graft._

/** Dump `.explain("formatted")` of declared queries to files:
  * `runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]`
  * writes `<outDir>/<query>_<suffix>.txt` per query — the plans/r15
  * deliverable (before/after captures from the two checkouts). Plans are
  * captured WITHOUT executing (explain of the returned frame); lifecycle
  * queries' multi-job structure is documented separately by JobProfile
  * counts in OPTIMIZATION_r15.md. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val s = GraftSession.create()
    names.foreach { n =>
      val q = SparkEntry.allQueries.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      val df =
        try q.run(s, dir)
        catch { case e: Exception =>
          System.err.println(s"PLANDUMP SKIP $n: ${e.getMessage}")
          null
        }
      if (df != null) {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"PLANDUMP OK $n (${plan.length} chars)")
      }
    }
    s.stop()
  }
}
