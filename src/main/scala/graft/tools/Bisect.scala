package graft.tools

import graft._

/** Intra-JVM interference bisector:
  * `runMain graft.tools.Bisect <target> [loIdx] [hiIdx] [sfDir] [reps]`
  * runs the declared queries with indices [loIdx, hiIdx) `reps` times
  * each (default 1; Bench runs every query twice, so reps=2 replicates
  * its JVM state), then times <target> three times —
  * binary-searching loIdx/hiIdx pinpoints which predecessor leaves
  * session state (conf, cache, codegen, GC pressure) that changes the
  * target's steady-state cost inside one shared JVM, which a per-query
  * timer like Explain cannot see.
  */
object Bisect {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Bisect <target> [loIdx] [hiIdx] [sfDir] [reps]")
    val name = args(0)
    val all = SparkEntry.allQueries
    val targetIdx = all.indexWhere(_.name == name)
    require(targetIdx >= 0,
      s"unknown query $name; usage: Bisect <target> [loIdx] [hiIdx] [sfDir] [reps]")
    val lo = if (args.length > 1) args(1).toInt else 0
    val hi = if (args.length > 2) args(2).toInt else targetIdx
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val reps = if (args.length > 4) args(4).toInt else 1
    val s = GraftSession.create()
    val q = all(targetIdx)
    all.slice(lo, hi).foreach { p =>
      (1 to reps).foreach { _ =>
        try p.run(s, dir).count()
        catch { case e: Throwable => println(s"BISECT_PREFIX_FAIL ${p.name}: ${e.getMessage}") }
      }
    }
    println(s"BISECT prefix [$lo,$hi) = ${all.slice(lo, hi).map(_.name).mkString(",")}")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = q.run(s, dir).count()
      println(f"BISECT_TIME run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    s.stop()
  }
}
