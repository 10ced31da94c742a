package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multi-merge BPE training loop (q141 is one iteration's counting
  * kernel; bpeTrain is the driver loop that applies each winning merge
  * and re-runs it). Verified against an INDEPENDENT reference
  * implementation — a classic index-scanning greedy merger over plain
  * Scala collections, no shared code with the Spark fold — on the real
  * documents fixture, plus a plan-flatness check that the per-iteration
  * localCheckpoint keeps iteration k's kernel plan identical to
  * iteration 1's (the property that makes per-iteration cost flat at
  * any merge count). */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  /** Reference BPE: per iteration count adjacent pairs, pick (count
    * desc, a, b) minimum, merge greedily left-to-right by index scan. */
  private def refBpe(words: Seq[String], nMerges: Int)
      : (Seq[(Int, String, String, Long)], Seq[Seq[String]]) = {
    var corpus: Seq[Vector[String]] =
      words.filter(_.length >= 2).map(_.map(_.toString).toVector)
    val merges = (1 to nMerges).map { it =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      corpus.foreach(_.sliding(2).foreach {
        case Seq(x, y) => counts((x, y)) = counts.getOrElse((x, y), 0L) + 1
        case _ =>
      })
      val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
      corpus = corpus.map { syms =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
      (it, a, b, n)
    }
    (merges, corpus)
  }

  test("bpeTrain's 3 learned merges match the reference scanner on the fixture corpus") {
    import spark.implicits._
    val got = graft.functions.TextAnalysis.bpeTrain(spark, sfDir, 3)
    val words = Tables.t(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.trim($"text")).collect()
      .flatMap(_.getString(0).split(" ")).toSeq
    val (want, refCorpus) = refBpe(words, 3)
    assert(got === want)
    // vocabulary growth: each merged symbol is new (2+ chars, distinct
    // from every prior symbol) and survives into the merged corpus
    val mergedSyms = got.map { case (_, a, b, _) => a + b }
    assert(mergedSyms.distinct.size === 3, s"merges must be distinct: $got")
    val finalVocab = refCorpus.flatten.toSet
    mergedSyms.foreach(m => assert(finalVocab.contains(m),
      s"merged symbol '$m' must appear in the merged corpus"))
    // merge counts can only shrink: a pair beating iteration k's winner
    // would have been chosen at k (new pairs created by a merge are
    // bounded by that merge's own count)
    val ns = got.map(_._4)
    assert(ns === ns.sorted.reverse, s"merge counts must be non-increasing: $ns")
  }

  test("per-iteration kernel plan stays flat: iteration 3's plan equals iteration 1's shape") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def opCount(df: org.apache.spark.sql.DataFrame): Int = {
      df.queryExecution.executedPlan.treeString
        .linesIterator.size
    }
    val c0 = Tables.t(spark, sfDir, "documents")
      .select(explode(split(trim($"text"), " ")).as("word"))
      .filter(length($"word") >= 2)
      .select(expr(
        "transform(sequence(1, length(word)), j -> substring(word, j, 1))")
        .as("syms"))
      .localCheckpoint(true)
    val k1 = opCount(graft.functions.TextAnalysis.bpePairCounts(c0))
    var c = c0
    Seq(("a", "b"), ("c", "d")).foreach { case (a, b) =>
      c = c.select(graft.functions.TextAnalysis.bpeApplyMerge($"syms", a, b).as("syms"))
        .localCheckpoint(true)
    }
    val k3 = opCount(graft.functions.TextAnalysis.bpePairCounts(c))
    assert(k3 === k1,
      s"iteration-3 kernel plan ($k3 lines) must match iteration-1 ($k1) — " +
        "the localCheckpoint between merges is what keeps per-iteration cost flat")
  }
}
