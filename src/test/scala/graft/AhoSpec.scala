package graft

import graft.catalyst.AhoCorasick
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q453's kernel contract: the dense-DFA Aho-Corasick mask must agree
  * with a naive per-pattern contains() on every (doc, pattern) pair —
  * including nested patterns, overlap positions, boundary matches, and
  * non-ASCII byte sequences (UTF-8's self-synchronization is what makes
  * byte-level presence == character-level presence). */
class AhoSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("ac_mask presence equals naive contains() for every (doc, " +
    "pattern) pair on the corpus dictionary") {
    val pats = graft.functions.TextAnalysis.q453Patterns
    val docs = Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val got = docs
      .select($"doc_id", AhoCorasick.ac_mask($"text", pats).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0); val t = r.getString(1)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert((((got(id) >> i) & 1L) == 1L) == t.contains(p),
          s"doc $id disagrees with contains() on '$p'")
      }
    }
    // and the absent probe reported nowhere
    val absentBit = pats.indexOf("never-in-corpus")
    assert(got.values.forall(m => ((m >> absentBit) & 1L) == 0L))
  }

  test("DFA edge semantics: nested, overlapping, boundary, and empty " +
    "inputs — codegen and interpreted paths agree") {
    val pats = Seq("aa", "aab", "ab", "b", "xyz")
    val texts = Seq("aaab", "b", "", "xy", "zaaa", "xyzxyz", "ba")
    val got = texts.toDF("text")
      .select($"text", AhoCorasick.ac_mask($"text", pats).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (dfa, out) = AhoCorasick.buildDfa(pats)
    for (t <- texts; (p, i) <- pats.zipWithIndex) {
      assert((((got(t) >> i) & 1L) == 1L) == t.contains(p),
        s"codegen path: '$t' vs '$p'")
      val ev = AhoCorasick.scanMask(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), dfa, out)
      assert((((ev >> i) & 1L) == 1L) == t.contains(p),
        s"interpreted path: '$t' vs '$p'")
    }
  }

  test("q453 plan: the ac_mask projection stays inside whole-stage " +
    "codegen — the one-DFA-pass-per-document claim is only worth its " +
    "name if the scan loop is codegen'd, not interpreter-fallback") {
    val pats = graft.functions.TextAnalysis.q453Patterns
    val df = Tables.t(spark, sfDir, "documents")
      .select(AhoCorasick.ac_mask($"text", pats).as("m"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("ac_mask")),
      s"ac_mask fell out of WholeStageCodegen:\n${plan.take(1200)}")
  }

  test("non-ASCII UTF-8 patterns: byte-level presence equals " +
    "character-level presence") {
    val pats = Seq("héllo", "é", "日本", "ab")
    val texts = Seq("xhéllox", "日本語の文", "plain ab", "none", "héllo")
    val got = texts.toDF("text")
      .select($"text", AhoCorasick.ac_mask($"text", pats).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- texts; (p, i) <- pats.zipWithIndex)
      assert((((got(t) >> i) & 1L) == 1L) == t.contains(p),
        s"'$t' vs '$p'")
  }
}
