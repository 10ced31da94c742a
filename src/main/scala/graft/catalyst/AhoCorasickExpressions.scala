package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.{ColumnBridgeImpl => ColumnBridge}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matching (Aho & Corasick 1975) compiled to
  * a dense byte-level DFA — the dictionary-screening kernel a training
  * corpus runs constantly (blocklist terms, PII markers, license
  * fragments, contamination probes): ONE pass over each document decides
  * presence for the WHOLE dictionary, where the naive plan runs one
  * `contains` scan per pattern (d scans of every byte at 100 TB).
  *
  * Engine shape, same discipline as [[DamerauLev]]/ZOrderExpressions:
  * the automaton is built ONCE on the driver from the bounded pattern
  * dictionary (goto trie over UTF-8 bytes; BFS fail links folded into a
  * dense `state x 256` transition table, so the hot loop has NO failure
  * chain — one array read per input byte); the expression's codegen
  * emits one static call carrying the two table arrays as referenced
  * objects, keeping the scan inside whole-stage codegen. Output is a
  * 64-bit presence BITMASK (bit i = pattern i occurs somewhere in the
  * document), which bounds the dictionary at 63 patterns per expression
  * — wider dictionaries shard across masks. Matching is over raw UTF-8
  * bytes, which for substring PRESENCE is equivalent to code-point
  * matching (UTF-8 is self-synchronizing: a byte-level occurrence of a
  * valid UTF-8 pattern is always a character-level occurrence). */
object AhoCorasick {

  /** Build the dense DFA: returns (transitions: state*256 flat table,
    * outMask: per-state bitmask of patterns ENDING at or reachable via
    * fail links from that state). Driver-side, O(total pattern bytes x
    * 256) ints — a dictionary artifact, never per-row work. */
  def buildDfa(patterns: Seq[String]): (Array[Int], Array[Long]) = {
    require(patterns.nonEmpty && patterns.size <= 63,
      s"1..63 patterns per mask (got ${patterns.size})")
    require(patterns.forall(_.nonEmpty), "empty pattern matches everything")
    val maxStates = patterns.map(_.getBytes("UTF-8").length).sum + 1
    val next = Array.fill(maxStates * 256)(-1)
    val out = new Array[Long](maxStates)
    var nStates = 1
    patterns.zipWithIndex.foreach { case (p, i) =>
      var st = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (next(st * 256 + c) == -1) { next(st * 256 + c) = nStates; nStates += 1 }
        st = next(st * 256 + c)
      }
      out(st) |= 1L << i
    }
    // BFS: resolve fail links INTO the dense table (goto(0, c) = 0 for
    // absent roots; deeper absent edges inherit the fail state's edge),
    // and fold fail-state output masks down so one lookup per byte
    // suffices
    val fail = new Array[Int](nStates)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val nxt = next(c)
      if (nxt == -1) next(c) = 0
      else { fail(nxt) = 0; queue.enqueue(nxt) }
      c += 1
    }
    while (queue.nonEmpty) {
      val st = queue.dequeue()
      out(st) |= out(fail(st))
      c = 0
      while (c < 256) {
        val nxt = next(st * 256 + c)
        if (nxt == -1) next(st * 256 + c) = next(fail(st) * 256 + c)
        else { fail(nxt) = next(fail(st) * 256 + c); queue.enqueue(nxt) }
        c += 1
      }
    }
    (java.util.Arrays.copyOf(next, nStates * 256), java.util.Arrays.copyOf(out, nStates))
  }

  /** The hot loop: one dense-table read and one mask OR per input byte. */
  def scanMask(s: UTF8String, dfa: Array[Int], out: Array[Long]): Long = {
    val n = s.numBytes()
    var st = 0
    var mask = 0L
    var i = 0
    while (i < n) {
      st = dfa(st * 256 + (s.getByte(i) & 0xff))
      mask |= out(st)
      i += 1
    }
    mask
  }

  /** ac_mask(text) → long bitmask of dictionary patterns present. */
  def ac_mask(text: Column, patterns: Seq[String]): Column = {
    val (dfa, out) = buildDfa(patterns)
    ColumnBridge.column(AhoCorasickMask(
      ColumnBridge.expression(text), dfa, out))
  }
}

/** ac_mask(string) → long; the DFA tables ride the expression as
  * referenced objects (bounded dictionary artifacts), codegen is one
  * static call — the enclosing WholeStageCodegen span stays intact. */
case class AhoCorasickMask(child: Expression, dfa: Array[Int],
    out: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullSafeEval(input: Any): Any =
    AhoCorasick.scanMask(input.asInstanceOf[UTF8String], dfa, out)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dfaRef = ctx.addReferenceObj("acDfa", dfa, "int[]")
    val outRef = ctx.addReferenceObj("acOut", out, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.catalyst.AhoCorasick.scanMask($c, $dfaRef, $outRef);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): AhoCorasickMask = copy(child = newChild)
  override def prettyName: String = "ac_mask"
}
