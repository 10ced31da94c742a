package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the PQ coder (q222) the rows-only gate can't see:
  * code-range bounds, bit-stable determinism, agreement of the native
  * TopCentroids argmax with an independent SQL-expressed argmax, and
  * the Lloyd-training improvement over the seed codebooks.
  */
class PqSpec extends AnyFunSuite {
  import TestSession._

  private lazy val e = Tables.t(spark, sfDir, "embeddings")

  test("codes bounded, deterministic, and residuals non-negative") {
    val a = SparkEntry.queries("q222_pq_codes")(spark, sfDir).collect()
    val b = SparkEntry.queries("q222_pq_codes")(spark, sfDir).collect()
    assert(a.sameElements(b), "PQ coding must be bit-stable across runs")
    a.foreach { r =>
      (1 to 4).foreach { j =>
        val c = r.getInt(j)
        assert(c >= 0 && c < 16, s"code out of range: $c")
      }
      assert(r.getLong(5) >= -4, // -0.0-class rounding slack per subspace
        s"vec ${r.getLong(0)}: negative residual ${r.getLong(5)}")
    }
  }

  test("native TopCentroids argmax agrees with an independent SQL argmax " +
    "on every (vector, subspace)") {
    import spark.implicits._
    val cbs = graft.operators.Similarity.pqCodebooks(e, iters = 2)
    val coded = graft.operators.Similarity.pqCode(e, cbs)
    (0 until 4).foreach { j =>
      val cblit = typedLit(cbs(j).map(_.toSeq).toSeq)
      // independent argmax: 16 per-centroid cosines materialized as an
      // array, argmax via array_position(array_max) — a different code
      // path from TopCentroids' internal top-k loop (same earliest-
      // index tie-break by construction)
      val sl = slice($"embedding", j * 16 + 1, 16)
      val dists = transform(sequence(lit(1), lit(16)), c =>
        graft.operators.Similarity.cosine(sl,
          element_at(cblit, c).cast("array<float>")))
      val sqlCode =
        expr("array_position(dists, array_max(dists))").cast("int") - 1
      val mismatches = e
        .withColumn("dists", dists)
        .withColumn("sql_code", sqlCode)
        .join(coded.select($"vec_id", col(s"code$j")), Seq("vec_id"))
        .filter(col(s"code$j") =!= $"sql_code")
        .count()
      assert(mismatches == 0,
        s"subspace $j: native argmax disagrees with SQL argmax on " +
          s"$mismatches vectors")
    }
  }

  test("fused coarse+PQ trainer is BIT-IDENTICAL to the sequential " +
    "kmeansCodebook + pqCodebooks pair (one scan per iteration may not " +
    "move any mean by an ULP)") {
    import graft.operators.Similarity._
    val hist = e.filter(col("vec_id") % 10 =!= 0)
    val (coarse, pqs) = trainIvfPqCodebooks(hist, nlist = 16, iters = 2)
    val seqCoarse = kmeansCodebook(hist, 16, 2)
    val seqPqs = pqCodebooks(hist, iters = 2)
    assert(coarse.length == seqCoarse.length)
    coarse.zip(seqCoarse).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.sameElements(b), s"coarse centroid $i differs") }
    pqs.zip(seqPqs).zipWithIndex.foreach { case ((pa, pb), j) =>
      pa.zip(pb).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.sameElements(b), s"pq subspace $j centroid $i differs") }
    }
  }

  test("two Lloyd iterations do not worsen the total cosine residual vs " +
    "the seed codebooks") {
    def total(iters: Int): Long =
      graft.operators.Similarity
        .pqCode(e, graft.operators.Similarity.pqCodebooks(e, iters = iters))
        .agg(sum(col("resid_e6"))).head().getLong(0)
    val seed = total(0)
    val trained = total(2)
    assert(trained <= seed,
      s"training must not worsen quantization: seed $seed -> trained $trained")
  }
}
