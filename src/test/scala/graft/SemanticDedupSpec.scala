package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** q126's contract: cluster-local semantic dedup is conservative (finds
  * only true near-dup pairs — a subset of the exact global pair set),
  * conserves membership, and never misses a pair of identical vectors
  * (identical points share a nearest centroid, so they always co-cluster).
  */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSession._
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def fixtureEmb = Tables.t(spark, sfDir, "embeddings")
    .select($"vec_id", $"embedding")

  test("kmeans codebook: k rows of Dim, deterministic across reruns") {
    val cb1 = Similarity.kmeansCodebook(fixtureEmb, 8, 3)
    val cb2 = Similarity.kmeansCodebook(fixtureEmb, 8, 3)
    assert(cb1.length === 8)
    assert(cb1.forall(_.length === Similarity.Dim))
    assert(cb1.map(_.toSeq).toSeq === cb2.map(_.toSeq).toSeq,
      "rounded Lloyd means must be run-stable")
    // training moved the centroids off their seed vectors
    val seeds = Similarity.ivfCodebook(fixtureEmb, 8)
    assert(cb1.map(_.toSeq).toSeq !== seeds.map(_.toSeq).toSeq)
  }

  test("q126: members conserved; pairs are a subset of the exact global pairs") {
    val out = SparkEntry.queries("q126_semantic_dedup")(spark, sfDir).collect()
    assert(out.map(_.getLong(1)).sum === fixtureEmb.count())
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        "dropped docs cannot exceed dup pairs in a cluster")
    }

    // recompute the cluster-local pairs and compare against the exact
    // global cross-join at the same threshold (subset: clustering can
    // only LOSE cross-cluster pairs, never invent one)
    val e = fixtureEmb
    val cb = Similarity.kmeansCodebook(e, 8, 3)
    val assigned = e.withColumn("cid",
      element_at(graft.catalyst.VecOps.top_centroids($"embedding", cb, 1), 1)
        .cast("int"))
    val ids = assigned.select($"cid", $"vec_id")
    val cand = ids.select($"cid", $"vec_id".as("v1"))
      .join(ids.select($"cid", $"vec_id".as("v2")), Seq("cid"))
      .filter($"v1" < $"v2").select($"v1", $"v2")
    val local = Similarity.confirmCosine(cand, e, 0.45)
      .select($"v1", $"v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val global = Similarity.confirmCosine(
      e.select($"vec_id".as("v1")).crossJoin(e.select($"vec_id".as("v2")))
        .filter($"v1" < $"v2"), e, 0.45)
      .select($"v1", $"v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local.subsetOf(global), s"invented pairs: ${local.diff(global)}")
  }

  test("a planted identical pair is always caught (co-clustering guarantee)") {
    // 40 spread-out base vectors + one exact duplicate of vec 7: the
    // duplicate shares vec 7's nearest centroid by construction, so the
    // cluster-local search must confirm the pair at cos = 1.
    val rnd = new scala.util.Random(3L)
    val base = (0L until 40L).map(i =>
      (i, Array.fill(Similarity.Dim)(rnd.nextGaussian().toFloat)))
    val planted = base :+ (99L, base(7)._2.clone())
    val e = planted.toDF("vec_id", "embedding")
    val cb = Similarity.kmeansCodebook(e, 4, 2)
    val assigned = e.withColumn("cid",
      element_at(graft.catalyst.VecOps.top_centroids($"embedding", cb, 1), 1)
        .cast("int"))
    val ids = assigned.select($"cid", $"vec_id")
    val cand = ids.select($"cid", $"vec_id".as("v1"))
      .join(ids.select($"cid", $"vec_id".as("v2")), Seq("cid"))
      .filter($"v1" < $"v2").select($"v1", $"v2")
    val pairs = Similarity.confirmCosine(cand, e, 0.99)
      .select($"v1", $"v2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((7L, 99L)),
      s"identical pair lost by clustering: ${pairs.toSeq}")
  }
}
