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
