package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the persisted IVF index + incremental add (q233/q234)
  * that a rows-only check can't see: the incremental path's no-history-
  * read guarantee, codebook round-trip exactness, replay idempotence,
  * recall vs the exact baseline, streaming/batch agreement, and the
  * layout's partition-pruning property.
  */
class IvfIndexSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private lazy val e = Tables.t(spark, sfDir, "embeddings")
    .select($"vec_id", $"embedding")
  private lazy val history = e.filter($"vec_id" % 10 =!= 0)
  private lazy val batch = e.filter($"vec_id" % 10 === 0)

  // one shared index build for the whole suite (training is the slow part)
  private lazy val root: String = {
    val r = TempRoots.freshForDir("graft_ivf_spec", sfDir).toString
    Similarity.writeIvfIndex(history, r, nlist = 16, iters = 2)
    r
  }

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  test("incremental add scans ONLY the batch — history lists and corpus " +
    "history are never re-read") {
    val cb = Similarity.readIvfCodebook(spark, root)
    // the exact frame addIvfBatch writes
    val paths = scanPaths(Similarity.ivfAssign(batch, cb))
    assert(paths.nonEmpty, "expected a file scan of the batch input")
    assert(paths.forall(p => !p.contains(root)),
      s"the add path must not touch the persisted index data: $paths")
    // and the codebook reload is k rows, a driver artifact — not a scan
    // that grows with the corpus
    assert(spark.read.parquet(s"$root/codebook").count() == 16)
  }

  test("persisted codebook round-trips the trained one bit-exactly") {
    val trained = Similarity.kmeansCodebook(history, 16, 2)
    val reloaded = Similarity.readIvfCodebook(spark, root)
    assert(reloaded.length == trained.length)
    trained.zip(reloaded).zipWithIndex.foreach { case ((t, r), i) =>
      assert(t.sameElements(r), s"centroid $i drifted through parquet")
    }
  }

  test("merged index holds exactly the corpus, each vector assigned as a " +
    "full one-shot assignment with the same codebook would") {
    Similarity.addIvfBatch(batch, root, "spec_b0")
    val merged = spark.read.parquet(s"$root/lists")
      .select($"vec_id", $"list_id".cast("int").as("list_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cb = Similarity.readIvfCodebook(spark, root)
    val oneShot = Similarity.ivfAssign(e, cb)
      .select($"vec_id", $"list_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == oneShot,
      "incremental add must land every vector in the list a one-shot " +
        "assignment picks")
  }

  test("replaying a batch key is idempotent — no duplicate vectors") {
    def batchRows = spark.read.parquet(s"$root/lists")
      .filter($"batch" === "spec_replay").count()
    Similarity.addIvfBatch(batch, root, "spec_replay")
    val once = batchRows
    Similarity.addIvfBatch(batch, root, "spec_replay") // the replay
    val twice = batchRows
    assert(once == twice && once == batch.count(),
      s"replay must rewrite, not append: $once vs $twice")
  }

  test("q233 recall vs brute force over the same corpus meets the q97 " +
    "IVF gate") {
    val brute = SparkEntry.queries("q66_knn_brute_force")(spark, sfDir)
      .select($"probe_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("q233_ivf_persisted_knn")(spark, sfDir)
      .select($"probe_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    // same fixtures + same nlist/nprobe as q97 (whose measured recall
    // holds >= 0.6 on uniform random data — the adversarial case)
    assert(recall >= 0.6, s"persisted-IVF recall $recall below the gate")
  }

  test("q234 streaming add converges to exactly q233's one-shot answer") {
    val a = SparkEntry.queries("q233_ivf_persisted_knn")(spark, sfDir)
      .collect().toSeq
    val b = SparkEntry.queries("q234_stream_ivf_add")(spark, sfDir)
      .collect().toSeq
    assert(a == b,
      "micro-batch split must not change the merged index's answer")
  }

  test("q250 IVF-PQ ADC: exact output shape, recall floor vs brute " +
    "force, deterministic across reruns") {
    val brute = SparkEntry.queries("q66_knn_brute_force")(spark, sfDir)
      .select($"probe_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = SparkEntry.queries("q250_ivf_pq_adc")(spark, sfDir).collect()
    val b = SparkEntry.queries("q250_ivf_pq_adc")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "integer-micros training + ADC must be " +
      "bit-deterministic across reruns")
    assert(a.length == 40, "8 probes x top-5 exactly")
    val adcSet = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect adcSet).size.toDouble / brute.size
    // two approximations stack (nprobe=4 coarse routing, 4-byte PQ
    // scoring of the shortlist) on uniform-random fixtures — LSH/IVF's
    // adversarial case; the exact top-50 re-rank recovers most of it
    assert(recall >= 0.5, s"IVF-PQ ADC recall $recall below floor") // measured 0.80
    info(f"IVF-PQ ADC recall vs exact: $recall%.2f")
  }

  test("the lists layout partition-prunes: a probed-list filter scans " +
    "only its directories") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val probed = spark.read.parquet(s"$root/lists")
      .filter($"list_id".isin(3, 7))
    val scans = probed.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "list_id must reach the scan as a partition filter — that is the " +
        "whole point of partitionBy(list_id): a probe touches " +
        "nprobe/nlist of the corpus at ANY scale")
    // and the pruned scan READS strictly fewer files than a full scan
    // (execute both; numFiles is the post-pruning metric)
    probed.collect()
    val full = spark.read.parquet(s"$root/lists")
    full.collect()
    def numFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numFiles").value
      }.sum
    assert(numFiles(probed) < numFiles(full),
      s"pruning read ${numFiles(probed)} files vs full ${numFiles(full)}")
  }
}
