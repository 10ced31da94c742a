package graft.tools

import graft._

/** Plan auditor: `runMain graft.tools.Explain <queryName> [sfDir] [runs]`
  * prints the formatted physical plan and per-run wall times for one
  * declared query — the .explain("formatted") + iterate loop the scale
  * design process uses, packaged so any query can be audited on demand.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName> [sfDir] [runs]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val s = GraftSession.create()
    val q = SparkEntry.allQueries.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    q.run(s, dir).explain("formatted")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.run(s, dir).count()
      println(f"EXPLAIN_TIME run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    s.stop()
  }
}
