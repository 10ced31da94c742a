package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.{ColumnBridgeImpl => ColumnBridge}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 16-bit coordinates — the data-layout
  * kernel behind multi-dimension range pruning (SURVEY §2B layout rows;
  * public technique: Morton 1966, the Delta Lake / Iceberg OPTIMIZE
  * ZORDER idea re-expressed as a native expression). Sorting or
  * range-bucketing by z(a, b) makes file ranges simultaneously selective
  * on BOTH columns: a 1/4-width range on either coordinate constrains
  * every other bit of z, so equal-width z buckets shrink toward ~1/4 of
  * files touched per dimension instead of the linear layout's
  * all-files-touched on its unsorted dimension (q261 measures exactly
  * that).
  *
  * The spread uses the branchless magic-number doubling sequence (shift,
  * OR, mask — public bit-twiddling folklore), so the whole kernel is four
  * shift/mask pairs per coordinate inlined straight into whole-stage
  * codegen: no loop, no call, no branch in the hot path.
  */
object ZOrder {
  /** Spread the low 16 bits of x to the even bit positions of a 32-bit
    * lane: 0b...b3b2b1b0 → 0b...0b3_0b2_0b1_0b0. */
  def spread16(x: Long): Long = {
    var v = x & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** z = interleave(a, b), a on even bits, b on odd bits; 32-bit result. */
  def interleave16(a: Long, b: Long): Long =
    spread16(a) | (spread16(b) << 1)

  def z_interleave16(a: Column, b: Column): Column =
    ColumnBridge.column(ZInterleave16(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** z_interleave16(bigint, bigint) → bigint. Inputs are masked to 16 bits
  * (callers bucket first); fully inlined codegen. */
case class ZInterleave16(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (va, vb) = (ctx.freshName("za"), ctx.freshName("zb"))
      def steps(v: String): String =
        s"""$v = ($v | ($v << 8)) & 0x00ff00ffL;
           |$v = ($v | ($v << 4)) & 0x0f0f0f0fL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""long $va = $a & 0xffffL; long $vb = $b & 0xffffL;
         |${steps(va)}
         |${steps(vb)}
         |${ev.value} = $va | ($vb << 1);""".stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZInterleave16 = copy(l, r)
  override def prettyName: String = "z_interleave16"
}

/** Hilbert curve index of a 2-D coordinate (Hilbert 1891; the xy2d
  * walk as published on the public Wikipedia "Hilbert curve" page) —
  * Z-order's locality-superior sibling: Morton's diagonal jumps are
  * gone, so equal-width index ranges are CONTIGUOUS rectangles-ish
  * regions and range probes touch fewer files at the same bucket
  * count (q373 measures the comparison against q261's Morton
  * baseline). `bits` is the per-coordinate order (bits=8 → a 256x256
  * grid, index in [0, 65536)); the defining property — consecutive
  * indexes are grid-adjacent — is pinned by KernelPropertySpec over
  * the full 16x16 grid at bits=4.
  */
object Hilbert {
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1); var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * (rx * (3 - ry) + (1 - rx) * ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert_index(bits: Int, a: Column, b: Column): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(a), ColumnBridge.expression(b), bits))
}

/** hilbert_index(bigint, bigint) → bigint; inputs masked to `bits`
  * bits. The per-row walk is a fixed `bits`-iteration loop emitted
  * straight into whole-stage codegen (no call, no allocation). */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (x, y, d, s, rx, ry, t) = (ctx.freshName("hx"),
        ctx.freshName("hy"), ctx.freshName("hd"), ctx.freshName("hs"),
        ctx.freshName("hrx"), ctx.freshName("hry"), ctx.freshName("ht"))
      val n = 1L << bits
      s"""long $x = $a & ${n - 1}L; long $y = $b & ${n - 1}L;
         |long $d = 0L;
         |for (long $s = ${n >> 1}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ($rx * (3L - $ry) + (1L - $rx) * $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;""".stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertIndex = copy(l, r)
  override def prettyName: String = "hilbert_index"
}
