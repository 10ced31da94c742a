package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JaccardRewrite optimizer rule: fires on the composed idiom, leaves
  * results identical, and skips non-matching shapes. */
class JaccardRewriteSpec extends AnyFunSuite {
  import TestSession._

  test("rule rewrites size(intersect)/size(union) into jaccard_sim") {
    import spark.implicits._
    // spark.range (not a LocalRelation) so ConvertToLocalRelation can't
    // pre-evaluate the projection before the rewrite runs. No empty/empty
    // row — ANSI Divide errors on 0/0; shingle_hashes never emits an
    // empty array, so the rewrite is safe on its pipelines.
    val df = spark.range(2)
      .select(
        when($"id" === 0, typedLit(Seq(1L, 2L, 3L))).otherwise(typedLit(Seq(1L))).as("a"),
        when($"id" === 0, typedLit(Seq(2L, 3L, 4L))).otherwise(typedLit(Seq(9L))).as("b"),
        $"id")
      .withColumn("jac",
        size(array_intersect($"a", $"b")).cast("double") / size(array_union($"a", $"b")))
      .orderBy($"id")
    assert(df.queryExecution.optimizedPlan.toString.contains("jaccard_sim"),
      df.queryExecution.optimizedPlan.toString)
    val got = df.select($"jac").collect().map(_.getDouble(0))
    assert(got(0) === 0.5) // |{2,3}| / |{1,2,3,4}|
    assert(got(1) === 0.0)
  }

  test("kernel matches composed set semantics on duplicates and nulls") {
    import graft.catalyst.VecOps
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def arr(xs: Any*) = new GenericArrayData(xs.toArray)
    // duplicates dedup like array_intersect/array_union
    assert(VecOps.jaccard(arr(1L, 1L), arr(1L)) === 1.0)
    assert(VecOps.jaccard(arr(1L, 1L, 2L), arr(1L)) === 0.5)
    // null elements compare equal (one distinct member per side)
    assert(VecOps.jaccard(arr(null, 1L), arr(null)) === 0.5)
    assert(VecOps.jaccard(arr(), arr()).isNaN) // JaccardSim surfaces as NULL
  }

  test("rule does not fire across different array pairs or non-long arrays") {
    import spark.implicits._
    val strings = Seq((Seq("x"), Seq("x"))).toDF("a", "b")
      .withColumn("jac",
        size(array_intersect($"a", $"b")).cast("double") / size(array_union($"a", $"b")))
    assert(!strings.queryExecution.optimizedPlan.toString.contains("jaccard_sim"))
    assert(strings.select($"jac").collect()(0).getDouble(0) === 1.0)

    val mixed = Seq((Seq(1L), Seq(1L), Seq(2L))).toDF("a", "b", "c")
      .withColumn("bad",
        size(array_intersect($"a", $"b")).cast("double") / size(array_union($"a", $"c")))
    assert(!mixed.queryExecution.optimizedPlan.toString.contains("jaccard_sim"))
  }

  test("q63 keeps matching its oracle through the rewrite") {
    val df = SparkEntry.queries("q63_minhash_lsh_pairs")(spark, sfDir)
    assert(df.queryExecution.optimizedPlan.toString.contains("jaccard_sim"))
    assert(df.count() > 0)
  }
}
