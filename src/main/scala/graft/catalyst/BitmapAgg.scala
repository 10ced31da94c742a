package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.{ColumnBridgeImpl => ColumnBridge}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** EXACT mergeable distinct-set aggregates over a DENSE integer id
  * domain, as native TypedImperativeAggregates (the third physical
  * strategy for windowed COUNT DISTINCT next to q203's explode-and-
  * re-distinct and q218's approximate HLL sketches): a group's user set
  * is one bitmap — update is a bit set, merge is a bitwise OR, both
  * commutative/associative, so the aggregate is deterministic under any
  * partitioning and combines MAP-SIDE with state bounded by maxId/8
  * bytes per group regardless of row count. A persisted day bitmap is
  * incrementally reusable exactly like q218's day sketches, but EXACT.
  *
  * Scale contract (stated, not hidden): this is the DENSE-domain tool —
  * memory is O(max id) bits per group (1.25 MB per group at 10M ids),
  * the right trade when ids are compact (the fixtures' user_id, any
  * dictionary-encoded entity). For sparse 64-bit domains use a
  * compressed bitmap (Roaring) or fall back to q218's HLL; the guard
  * throws loudly on out-of-range ids instead of silently exploding.
  */
object BitmapAgg {
  /** Hard ceiling on the id domain — a mis-keyed column (e.g. a hash
    * instead of a dense id) must fail, not allocate gigabytes. */
  val MaxBits: Long = 1L << 26

  def requireDense(v: Long): Int = {
    require(v >= 0 && v < MaxBits,
      s"bitmap_agg input $v outside the dense domain [0, $MaxBits) — " +
        "use a dictionary-encoded id, a Roaring bitmap, or HLL (q218)")
    v.toInt
  }

  def cardinality(bytes: Array[Byte]): Long =
    java.util.BitSet.valueOf(bytes).cardinality().toLong

  def bitmap_agg(c: Column): Column =
    ColumnBridge.column(
      BitmapSetAgg(ColumnBridge.expression(c)).toAggregateExpression())

  def bitmap_or_card_agg(c: Column): Column =
    ColumnBridge.column(
      BitmapOrCardAgg(ColumnBridge.expression(c)).toAggregateExpression())

  def bitmap_card(c: Column): Column =
    ColumnBridge.column(BitmapCard(ColumnBridge.expression(c)))
}

/** Fold a LongType id column into the group's bitmap (BinaryType out —
  * BitSet.toByteArray, trailing zeros trimmed, so serialized size tracks
  * the highest SEEN id, not MaxBits). */
case class BitmapSetAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] {

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet()

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) buf.set(BitmapAgg.requireDense(v.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: java.util.BitSet, b2: java.util.BitSet): java.util.BitSet = {
    b1.or(b2); b1
  }

  override def eval(buf: java.util.BitSet): Any = buf.toByteArray

  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): BitmapSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BitmapSetAgg =
    copy(child = cs.head)
  override def prettyName: String = "bitmap_set_agg"
}

/** OR pre-built bitmaps (BinaryType in) and emit the union cardinality —
  * the rolling-window / cross-cut union stage: merging K day bitmaps
  * costs O(bytes), never touches rows. */
case class BitmapOrCardAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] {

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet()

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null)
      buf.or(java.util.BitSet.valueOf(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: java.util.BitSet, b2: java.util.BitSet): java.util.BitSet = {
    b1.or(b2); b1
  }

  override def eval(buf: java.util.BitSet): Any = buf.cardinality().toLong

  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): BitmapOrCardAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapOrCardAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BitmapOrCardAgg =
    copy(child = cs.head)
  override def prettyName: String = "bitmap_or_card_agg"
}

/** Scalar popcount of a serialized bitmap (codegen'd — stays inside the
  * projection's whole-stage loop). */
case class BitmapCard(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    BitmapAgg.cardinality(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.BitmapAgg.cardinality($c)")
  override protected def withNewChildInternal(c: Expression): BitmapCard = copy(c)
  override def prettyName: String = "bitmap_card"
}
