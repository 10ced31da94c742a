package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch measurement for the q378 promote-or-refute decision. */
object ElbowMargin {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.create()
    import graft.catalyst.VecOps.top_centroids
    import spark.implicits._
    val e = Tables.t(spark, dir, "embeddings")
    Seq(2, 4, 8, 16).foreach { k =>
      val cb = graft.operators.Similarity.kmeansCodebook(e, k, iters = 2)
      // cosine to best and second-best centroid per vector
      val cblit = typedLit(cb.map(_.toSeq).toSeq)
      val withTop2 = e.select($"vec_id",
        top_centroids($"embedding", cb, 2).as("top2"), $"embedding")
      val margins = withTop2.select(
        graft.operators.Similarity.cosine($"embedding",
          element_at(cblit, element_at($"top2", 1).cast("int") + 1)
            .cast("array<float>")).as("c1"),
        graft.operators.Similarity.cosine($"embedding",
          element_at(cblit, element_at($"top2", 2).cast("int") + 1)
            .cast("array<float>")).as("c2"))
        .select(($"c1" - $"c2").as("margin"))
        .agg(min($"margin"), expr("percentile(margin, 0.01)"),
          count(when($"margin" < 1e-9, 1)))
        .head()
      println(s"MARGIN k=$k min=${margins.get(0)} p01=${margins.get(1)} " +
        s"n_below_1e-9=${margins.get(2)}")
    }
    spark.stop()
  }
}
