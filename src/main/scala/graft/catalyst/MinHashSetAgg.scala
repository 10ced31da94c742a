package graft.catalyst

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridgeImpl => ColumnBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Group-level MinHash signature as a native TypedImperativeAggregate
  * (SURVEY §2B "typed aggregator" row, the sketch-buffer variant): folds
  * every row's hashed-shingle array into one k-component signature per
  * group. min() is commutative/associative, so the sketch is
  * deterministic under any partitioning and merges in O(k) — the
  * mergeable-summary shape that lets "similarity between SOURCES"
  * (millions of docs per group at 100 TB) run as an ordinary partial+
  * final aggregation with constant-size state.
  *
  * Estimated Jaccard between two groups = fraction of equal signature
  * components (standard MinHash estimator, stderr ~ 1/sqrt(k)).
  */
case class MinHashSetAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var j = 0
      while (j < n) {
        val v = a.getLong(j)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(v, i.toLong)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): MinHashSetAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSetAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashSetAgg =
    copy(child = cs.head)
  override def prettyName: String = "minhash_set_agg"
}

object MinHashSetAgg {
  /** Column API: aggregate a hashed-shingle array column into a group
    * signature. */
  def minhash_set_agg(c: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashSetAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
