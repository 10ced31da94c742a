package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graft.{ColumnBridgeImpl => ColumnBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for document fingerprinting (SURVEY.md §2B
  * north-star "text analysis" row). Both are single-pass over the UTF-8
  * bytes, null-safe, and generate inline code (no virtual dispatch in the
  * hot loop) — the preferred shape for a 100 TB scan: whole-stage codegen
  * keeps them inside the same generated loop as the parquet reader.
  */
object TextHash {

  /** Polynomial rolling hash of the UTF-8 bytes modulo the Mersenne prime
    * 2^61-1 (base 263). Stable across runs/JVMs — usable as a persisted
    * document fingerprint.
    */
  def rollingHash(bytes: Object, offset: Long, length: Int): Long = {
    val M = (1L << 61) - 1
    val B = 263L
    var h = 0L
    var i = 0
    while (i < length) {
      val b = org.apache.spark.unsafe.Platform.getByte(bytes, offset + i) & 0xffL
      // (h * B + b) mod M without BigInt: h,B < 2^61 so use Math.multiplyHigh
      val lo = h * B
      val hi = Math.multiplyHigh(h, B)
      // fold 128-bit product mod 2^61-1: (x mod 2^61) + (x >> 61)
      var r = (lo & M) + ((lo >>> 61) | (hi << 3))
      r += b
      while (r >= M) r -= M
      h = r
      i += 1
    }
    h
  }

  def rollingHash(s: UTF8String): Long =
    rollingHash(s.getBaseObject, s.getBaseOffset, s.numBytes())

  /** 64-bit SimHash over whitespace-separated tokens: each token is
    * xxhash64'd; each signature bit is the sign of the per-bit vote sum.
    * Near-identical documents land within a small Hamming distance.
    */
  def simHash(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val str = s // tokenize on the JVM string boundary; tokens are short
    var start = 0
    val n = str.numBytes()
    var i = 0
    while (i <= n) {
      val isSep = i == n ||
        org.apache.spark.unsafe.Platform.getByte(str.getBaseObject, str.getBaseOffset + i) == ' '.toByte
      if (isSep) {
        if (i > start) {
          val h = XXH64.hashUnsafeBytes(str.getBaseObject, str.getBaseOffset + start, i - start, 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def rolling_hash(c: Column): Column = ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  def sim_hash(c: Column): Column = ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
}

case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.rollingHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.TextHash.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
  override def prettyName: String = "rolling_hash"
}

case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHash.simHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.TextHash.simHash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash = copy(c)
  override def prettyName: String = "sim_hash"
}
