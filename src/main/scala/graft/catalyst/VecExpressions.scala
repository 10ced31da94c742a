package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{ColumnBridgeImpl => ColumnBridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector/sketch kernels (SURVEY §2B similarity rows). The
  * higher-order-function formulation (zip_with + aggregate) allocates an
  * intermediate array per row pair; these expressions run a primitive loop
  * inside whole-stage codegen — the difference between a similarity scan
  * that is ALU-bound and one that is allocation-bound, which at 100 TB is
  * the whole game.
  */
object VecOps {

  /** One Deflater per thread for [[graft.catalyst.DeflateLen]]: reset per
    * row, never reallocated. Level 6, default strategy — deterministic
    * for a given JDK zlib; the spec pins invariances (ordering,
    * determinism), never golden byte counts, so a zlib upgrade cannot
    * silently break callers. The native zlib state is deliberately never
    * end()'d: it lives for the owning thread's lifetime, bounded at
    * ~256 KiB x the executor task-thread count (32 threads here → <8 MiB
    * per JVM, fixed) — releasing per-task would pay a native
    * alloc/free per partition for memory the pool immediately re-acquires. */
  private final class DeflateScratch {
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](8192)
  }
  private val deflaterTL =
    ThreadLocal.withInitial[DeflateScratch](() => new DeflateScratch)
  def deflateLen(text: UTF8String): Long = {
    val s = deflaterTL.get()
    val d = s.deflater
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(s.buf)
    total
  }

  /** Sequential-order double dot product of two float arrays (sequential
    * so results are bit-identical to any other sequential evaluator). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** All-planes random-hyperplane signature in one pass over the vector:
    * bit i set iff dot(v, plane_i) >= 0. `flat` is the nBits×dim plane
    * matrix row-major; per-plane dots accumulate sequentially in double,
    * bit-identical to the composed zip_with+aggregate formulation it
    * replaces (which allocated an intermediate array per plane per row —
    * 32 allocations/row at the q67/q68 settings). */
  def hyperplaneSig(v: ArrayData, flat: Array[Double], dim: Int): Long = {
    val nBits = flat.length / dim
    val n = math.min(v.numElements(), dim)
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      val base = i * dim
      var j = 0
      while (j < n) { acc += v.getFloat(j).toDouble * flat(base + j); j += 1 }
      if (acc >= 0.0) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Indices of the `nprobe` max-cosine centroids for a vector, one pass
    * over the flattened row-major codebook: per-centroid sequential dot +
    * norm ratio, then bounded selection (sim desc, index asc on ties —
    * deterministic). A zero-norm vector scores 0 against every centroid.
    * Centroid norms are precomputed by the expression. */
  def topCentroids(v: ArrayData, flat: Array[Double], cnorms: Array[Double],
      dim: Int, nprobe: Int): ArrayData = {
    val nlist = cnorms.length
    val n = math.min(v.numElements(), dim)
    var vsq = 0.0
    var j = 0
    while (j < n) { val x = v.getFloat(j).toDouble; vsq += x * x; j += 1 }
    val vnorm = math.sqrt(vsq)
    val sims = new Array[Double](nlist)
    var c = 0
    while (c < nlist) {
      var acc = 0.0
      val base = c * dim
      var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * flat(base + i); i += 1 }
      sims(c) = if (vnorm == 0.0 || cnorms(c) == 0.0) 0.0 else acc / (vnorm * cnorms(c))
      c += 1
    }
    val k = math.min(nprobe, nlist)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nlist)
    var r = 0
    while (r < k) {
      var best = -1
      var i = 0
      while (i < nlist) {
        if (!taken(i) && (best < 0 || sims(i) > sims(best))) best = i
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass MinHash signature over hashed shingles: k minima of
    * xxh64(shingle_hash, seed=i). */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val v = arr.getLong(j)
      var i = 0
      while (i < k) {
        val h = XXH64.hashLong(v, i.toLong)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** One-pass distinct 3-token shingle hashes of a whitespace-tokenized
    * text: per-token xxh64, combined per window via seeded chaining; <3
    * tokens degrade to one whole-text shingle (mirroring the string-level
    * semantics of the SQL oracle: same per-doc set sizes and the same
    * intersection sizes, with 64-bit-collision probability ~2^-64 per
    * pair). Avoids materializing any intermediate token/shingle strings —
    * the allocation profile that matters when the scan is 100 TB. */
  def shingleHashes(s: UTF8String, nGram: Int): ArrayData = {
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    val n = s.numBytes()
    var start = 0
    var i = 0
    while (i <= n) {
      val isSep = i == n ||
        org.apache.spark.unsafe.Platform.getByte(s.getBaseObject, s.getBaseOffset + i) == ' '.toByte
      if (isSep) {
        if (i > start)
          tokenHashes += XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset + start, i - start, 7L)
        start = i + 1
      }
      i += 1
    }
    val m = tokenHashes.length
    val out =
      if (m < nGram) {
        // degrade to ONE whole-document shingle over the token sequence
        // (not the raw bytes — so whitespace runs don't affect identity,
        // matching the SQL oracle's token-join semantics)
        var h = 1234567891011L
        var g = 0
        while (g < m) { h = XXH64.hashLong(tokenHashes(g), h); g += 1 }
        Array(h)
      } else {
        val seen = new java.util.HashSet[java.lang.Long](m * 2)
        val buf = new scala.collection.mutable.ArrayBuffer[Long](m)
        var w = 0
        while (w <= m - nGram) {
          var h = 1234567891011L
          var g = 0
          while (g < nGram) { h = XXH64.hashLong(tokenHashes(w + g), h); g += 1 }
          if (seen.add(h)) buf += h
          w += 1
        }
        buf.toArray
      }
    new GenericArrayData(out)
  }

  /** |A∩B| / |A∪B| for long arrays, set semantics identical to the
    * composed size(array_intersect)/size(array_union) form: duplicates
    * are deduped and a null element counts as one distinct member on each
    * side (array_intersect/array_union treat null = null). Both-empty
    * yields NaN, which JaccardSim surfaces as SQL NULL (the composed ANSI
    * form would raise DIVIDE_BY_ZERO — documented deviation, unreachable
    * from shingle pipelines). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[java.lang.Long](a.numElements() * 2)
    var aNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aNull = true else setA.add(a.getLong(i))
      i += 1
    }
    val setB = new java.util.HashSet[java.lang.Long](b.numElements() * 2)
    var bNull = false
    i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bNull = true else setB.add(b.getLong(i))
      i += 1
    }
    var common = 0
    val it = setB.iterator()
    while (it.hasNext) { if (setA.contains(it.next())) common += 1; }
    if (aNull && bNull) common += 1
    val na = setA.size + (if (aNull) 1 else 0)
    val nb = setB.size + (if (bNull) 1 else 0)
    val union = na + nb - common
    // NaN signals 0/0 to JaccardSim, which surfaces it as SQL NULL (the
    // non-ANSI composed form's result for two empty arrays)
    if (union == 0) Double.NaN else common.toDouble / union
  }

  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatVecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))

  def hyperplane_sig(c: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(c), planes))

  def top_centroids(c: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(TopCentroids(ColumnBridge.expression(c), centroids, nprobe))

  def deflate_len(c: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(c)))

  def shingle_hashes(c: Column, nGram: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), nGram))

  def jaccard_sim_col(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** jaccard_sim(array<long>, array<long>) → double: |A∩B| / |A∪B| in one
  * pass — hash-set the smaller side, stream the larger (inputs are
  * distinct-element arrays, as produced by shingle_hashes). Target of the
  * JaccardRewrite optimizer rule. */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VecOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r.isNaN) null else r // 0/0 (both arrays empty) → NULL
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.catalyst.VecOps.jaccard($a, $b);
      if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(l, r)
  override def prettyName: String = "jaccard_sim"
}

/** shingle_hashes(string, n) → array<long>: distinct hashed n-gram token
  * shingles in one pass (no intermediate token/shingle strings). */
case class ShingleHashes(child: Expression, nGram: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.shingleHashes(v.asInstanceOf[UTF8String], nGram)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.VecOps.shingleHashes($c, $nGram)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** deflate_len(string) → long: DEFLATE(level 6) output size of the
  * UTF-8 bytes, over a thread-local reused Deflater (reset per row,
  * allocation-free in steady state). The compression-ratio quality
  * kernel (q214) as a codegen'd expression instead of a Scala UDF —
  * the codec object is the one thing Catalyst can't express, but the
  * EXPRESSION wrapper around it can still live inside whole-stage
  * codegen with no encoder round-trip. */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VecOps.deflateLen(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.VecOps.deflateLen($c)")
  override protected def withNewChildInternal(c: Expression): DeflateLen = copy(child = c)
  override def prettyName: String = "deflate_len"
}

/** dot(array<float>, array<float>) → double, codegen'd primitive loop. */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.catalyst.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(l, r)
  override def prettyName: String = "float_vec_dot"
}

/** hyperplane_sig(array<float>) → long: all nBits plane dots in one
  * codegen'd primitive loop (vs one zip_with+aggregate pipeline per
  * plane). The plane matrix is a query-constant reference object. */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  private lazy val flat: Array[Double] = planes.flatten
  private lazy val dim: Int = planes.head.length
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneSig(v.asInstanceOf[ArrayData], flat, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", flat, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.catalyst.VecOps.hyperplaneSig($c, $ref, $dim)")
  }
  override protected def withNewChildInternal(c: Expression): HyperplaneSig =
    copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}

/** top_centroids(array<float>) → array<int>: the nprobe nearest-by-cosine
  * codebook indices in one codegen'd pass — the IVF coarse-quantizer
  * assignment as a NARROW projection (no crossJoin against a centroid
  * table, no window shuffle). The codebook is a query-constant reference
  * object, the same pattern as HyperplaneSig's plane matrix. */
case class TopCentroids(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {
  private lazy val flat: Array[Double] = centroids.flatten
  private lazy val dim: Int = centroids.head.length
  private lazy val cnorms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.topCentroids(v.asInstanceOf[ArrayData], flat, cnorms, dim, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refFlat = ctx.addReferenceObj("centroids", flat, "double[]")
    val refNorms = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.VecOps.topCentroids($c, $refFlat, $refNorms, $dim, $nprobe)")
  }
  override protected def withNewChildInternal(c: Expression): TopCentroids =
    copy(child = c)
  override def prettyName: String = "top_centroids"
}

/** minhash_sig(array<string>, k) → array<long>: one pass over the shingle
  * set computing all k permutation minima (vs k separate
  * array_min(transform(...)) passes + k intermediate arrays). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.minhash(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.VecOps.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}
