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

  // AQE hides scans inside stage wrappers until the query materializes —
  // recurse through them (the PlanSpec q220 convention)
  private def fileScans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    fileScans(df).flatMap(_.relation.location.rootPaths.map(_.toString))

  test("incremental add scans ONLY the batch — history lists and corpus " +
    "history are never re-read") {
    val cb = Similarity.readIvfCodebook(spark, root)
    val pqs = Similarity.readPqCodebooks(spark, root)
    // the exact frame addIvfBatch writes
    val paths = scanPaths(Similarity.ivfPqAssign(batch, cb, pqs))
    assert(paths.nonEmpty, "expected a file scan of the batch input")
    assert(paths.forall(p => !p.contains(root)),
      s"the add path must not touch the persisted index data: $paths")
    // and the codebook reloads are k / m×k rows, driver artifacts — not
    // scans that grow with the corpus
    assert(spark.read.parquet(s"$root/codebook").count() == 16)
    assert(spark.read.parquet(s"$root/pq_codebooks").count() == 4 * 16)
  }

  test("persisted codebook round-trips the trained one bit-exactly") {
    val trained = Similarity.kmeansCodebook(history, 16, 2)
    val reloaded = Similarity.readIvfCodebook(spark, root)
    assert(reloaded.length == trained.length)
    trained.zip(reloaded).zipWithIndex.foreach { case ((t, r), i) =>
      assert(t.sameElements(r), s"centroid $i drifted through parquet")
    }
  }

  test("persisted PQ codebooks round-trip the trained ones bit-exactly") {
    val trained = Similarity.pqCodebooks(history, iters = 2)
    val reloaded = Similarity.readPqCodebooks(spark, root)
    assert(reloaded.size == trained.size)
    trained.zip(reloaded).zipWithIndex.foreach { case ((tk, rk), j) =>
      assert(tk.length == rk.length, s"subspace $j lost centroids")
      tk.zip(rk).zipWithIndex.foreach { case ((t, r), i) =>
        assert(t.sameElements(r),
          s"PQ centroid ($j, $i) drifted through parquet")
      }
    }
  }

  test("ADC search path trains nothing and never reads embeddings in " +
    "the candidate scan — codes only") {
    // the zero-training property is structural (adcSearchPersisted takes
    // only the artifact path + probes); what the plan must additionally
    // prove is (a) every file scan is either the index or the probe
    // input, and (b) the ADC-scoring scan of the lists is column-pruned
    // to ids + codes — the 4-bytes-per-candidate claim, visible in the
    // scan's requiredSchema
    val probes = e.filter($"vec_id" < 8)
    val df = Similarity.adcSearchPersisted(spark, root, probes,
      k = 5, nprobe = 4)
    df.collect() // materialize so AQE exposes the final stages
    val paths = scanPaths(df)
    assert(paths.nonEmpty)
    assert(paths.forall(p => p.contains(root) || p.contains(sfDir)),
      s"search must scan only the artifact and the probe input: $paths")
    val listScans = fileScans(df)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(root)))
      .map(_.requiredSchema.fieldNames.toSet)
    assert(listScans.size >= 2,
      s"expected the codes scan + the re-rank scan, got $listScans")
    val adcScan = listScans.filter(_.contains("code0"))
    assert(adcScan.nonEmpty, s"no scan reads the PQ codes: $listScans")
    assert(adcScan.forall(!_.contains("embedding")),
      s"the ADC candidate scan must never read raw vectors: $adcScan")
  }

  test("merged index holds exactly the corpus, each vector assigned as a " +
    "full one-shot assignment with the same codebook would") {
    Similarity.addIvfBatch(batch, root, "spec_b0")
    val merged = spark.read.parquet(Similarity.ivfListsPath(spark, root))
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
    def batchRows = spark.read.parquet(Similarity.ivfListsPath(spark, root))
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

  test("compaction folds batches into base: search bit-identical, file " +
    "count strictly drops, rows conserved, and a REPLAYED add of a " +
    "folded batch is a no-op") {
    // fresh index so this test owns its batch keys end to end
    val r = TempRoots.freshForDir("graft_ivf_cmp_spec", sfDir).toString
    Similarity.writeIvfIndex(history, r, nlist = 16, iters = 2)
    val day1 = e.filter($"vec_id" % 20 === 0)
    val day2 = e.filter($"vec_id" % 20 === 10)
    Similarity.addIvfBatch(day1, r, "day1")
    Similarity.addIvfBatch(day2, r, "day2")
    def files(): Long = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(
        Similarity.ivfListsPath(spark, r).stripPrefix("file:")))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet")).toLong
      } finally walk.close()
    }
    def search(): Seq[org.apache.spark.sql.Row] =
      Similarity.knnIvfPersisted(spark, r, e.filter($"vec_id" < 8),
        k = 5, nprobe = 2).collect().toSeq
    def rows(): Long = spark.read.parquet(Similarity.ivfListsPath(spark, r)).count()
    val (s0, f0, n0) = (search(), files(), rows())
    assert(n0 == e.count(), "merged pre-compaction index holds the corpus")
    val folded = Similarity.compactIvfLists(spark, r)
    assert(folded == Seq("day1", "day2"),
      s"compaction must report the folded keys, got $folded")
    assert(search() == s0,
      "compaction moves bytes, never rows — search must be bit-identical")
    assert(files() < f0,
      s"compaction must strictly reduce file count: ${files()} vs $f0")
    assert(rows() == n0, "compaction must conserve the row multiset")
    assert(spark.read.parquet(Similarity.ivfListsPath(spark, r))
      .filter($"batch" =!= "base").count() == 0,
      "every batch partition must be folded into base")
    // the replay-of-a-folded-batch case: without the manifest this
    // rewrite would re-materialize day1's vectors beside their copies
    // in base — every later search double-counting them
    Similarity.addIvfBatch(day1, r, "day1")
    assert(rows() == n0 && search() == s0,
      "a replayed add of a compacted batch must be a no-op")
    // and a second compaction with nothing to fold is a safe no-op
    assert(Similarity.compactIvfLists(spark, r).isEmpty)
    assert(rows() == n0 && search() == s0)
  }

  test("q234's standing stream resumes from its checkpoint across a " +
    "stop/restart: no duplicated batch partitions, merged index equals " +
    "the one-shot assignment") {
    // The StreamingSpec session-window recipe applied to the index add:
    // part 1 streams in and lands; the query stops; part 2 arrives; a
    // restart against the SAME checkpoint must process only part 2 —
    // replayed micro-batches rewrite their own batch=<id> partitions
    // (dynamic overwrite), so even an uncommitted-batch replay cannot
    // duplicate vectors.
    val base = TempRoots.freshForDir("graft_ivf_restart", sfDir)
    val r = base.resolve("index").toString
    val src = base.resolve("src"); val ckpt = base.resolve("ckpt")
    java.nio.file.Files.createDirectories(src)
    Similarity.writeIvfIndex(history, r, nlist = 16, iters = 2)
    val part1 = e.filter($"vec_id" % 20 === 0)
    val part2 = e.filter($"vec_id" % 20 === 10)
    def arrive(part: org.apache.spark.sql.DataFrame): Unit =
      part.coalesce(1).write.mode("append").parquet(src.toString)
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    def runOnce(): Unit = {
      val q = spark.readStream.schema(sch).parquet(src.toString)
        .writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           batchId: Long) =>
            Similarity.addIvfBatch(batch, r, s"b$batchId")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    arrive(part1)
    runOnce()
    val afterPart1 = spark.read.parquet(Similarity.ivfListsPath(spark, r)).count()
    assert(afterPart1 == history.count() + part1.count(),
      "part 1 must land exactly once before the stop")
    arrive(part2)
    runOnce() // the restart
    val lists = spark.read.parquet(Similarity.ivfListsPath(spark, r))
    assert(lists.count() == e.count(),
      "restart must add ONLY part 2 — a re-processed part 1 would " +
        "duplicate its vectors")
    val cb = Similarity.readIvfCodebook(spark, r)
    val merged = lists.select($"vec_id", $"list_id".cast("int"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    val oneShot = Similarity.ivfAssign(e, cb)
      .select($"vec_id", $"list_id")
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(merged == oneShot,
      "the restarted stream's merged index must equal the one-shot " +
        "assignment exactly")
  }

  test("q313 self-maintaining stream: answer bit-equal to q233's " +
    "one-shot index, batch-partition count respects the compaction " +
    "policy") {
    val a = SparkEntry.queries("q233_ivf_persisted_knn")(spark, sfDir)
      .collect().toSeq
    val b = SparkEntry.queries("q313_stream_index_maintenance")(spark, sfDir)
      .collect().toSeq
    assert(a == b,
      "auto-compaction mid-stream must not change the merged index's " +
        "answer — compaction preserves rows, adds are split-invariant")
    // the policy: foreachBatch folds whenever >2 batch dirs accumulate,
    // so the post-stream count can be at most threshold + however many
    // batches the final fold left behind (== 0 if the last batch
    // triggered it; <= 2 + 1 otherwise)
    val root = TempRoots.forDir("graft_ivf_autocmp", sfDir).toString
    val dirs = new java.io.File(
      Similarity.ivfListsPath(spark, root).stripPrefix("file:"))
      .listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch=") &&
        f.getName != "batch=base")
    assert(dirs <= 3,
      s"compaction policy must bound batch partitions, found $dirs")
  }

  test("the lists layout partition-prunes: a probed-list filter scans " +
    "only its directories") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val probed = spark.read.parquet(Similarity.ivfListsPath(spark, root))
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
    val full = spark.read.parquet(Similarity.ivfListsPath(spark, root))
    full.collect()
    def numFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numFiles").value
      }.sum
    assert(numFiles(probed) < numFiles(full),
      s"pruning read ${numFiles(probed)} files vs full ${numFiles(full)}")
  }

  test("q415 delete lifecycle survives a restart: tombstones are disk " +
    "state, replay is a no-op, compaction applies-then-clears exactly " +
    "once") {
    // own index — the shared `root` must stay delete-free for the other
    // tests
    val r = TempRoots.freshForDir("graft_ivf_del_spec", sfDir).toString
    Similarity.writeIvfIndex(history, r, nlist = 16, iters = 2)
    val probes = e.filter($"vec_id" < 8)
    def search() = Similarity.adcSearchPersisted(spark, r, probes,
      k = 5, nprobe = 4).collect().toSeq.map(_.toString).sorted
    val before = search()
    // kill the current top-1 neighbors — guarantees the delete is
    // observable and the shortlist slots get re-filled
    val kill = Similarity.adcSearchPersisted(spark, r, probes,
        k = 1, nprobe = 4)
      .select($"vec_id").distinct().as[Long].collect().toSet
    assert(kill.nonEmpty)
    Similarity.deleteIvfVectors(kill.toSeq.sorted.toDF("vec_id"), r)
    val afterDelete = search()
    assert(afterDelete != before, "deleting top-1 ids must change results")
    val ids = Similarity.adcSearchPersisted(spark, r, probes,
      k = 5, nprobe = 4).select($"vec_id").as[Long].collect()
    assert(!ids.exists(kill.contains), "tombstoned ids surfaced in search")
    // "restart": all state is on disk — a fresh read path (new DataFrames
    // from the same dir) must see the tombstones; then an at-least-once
    // REPLAY of the same delete must change nothing
    Similarity.deleteIvfVectors(kill.toSeq.sorted.toDF("vec_id"), r)
    assert(search() == afterDelete, "replayed delete must be a no-op")
    val rowsBefore = spark.read.parquet(Similarity.ivfListsPath(spark, r)).count()
    Similarity.compactIvfLists(spark, r)
    assert(search() == afterDelete,
      "physical drop at compaction must be bit-identical to the logical " +
        "tombstone filter")
    assert(spark.read.parquet(Similarity.ivfListsPath(spark, r)).count() ==
      rowsBefore - kill.size, "compaction must drop exactly the kill set")
    assert(Similarity.ivfTombstones(spark, r).count() == 0,
      "compaction must clear applied tombstones")
    // post-clear replay: the rows are gone, the anti-join is a no-op
    Similarity.deleteIvfVectors(kill.toSeq.sorted.toDF("vec_id"), r)
    assert(search() == afterDelete)
    // knnIvfPersisted honors tombstones too
    val knnIds = Similarity.knnIvfPersisted(spark, r, probes, 5, 4)
      .select($"vec_id").as[Long].collect()
    assert(!knnIds.exists(kill.contains))
  }

  test("writeIvfIndex(copyCodebooksFrom) reproduces a fresh train " +
    "bit-identically: books, lists, and search all equal") {
    // the q418 reference-index build copies the streaming root's books
    // instead of re-running the Lloyd scans — sound ONLY because the
    // deterministic trainer on the same slice would reproduce them
    // bit-for-bit; this pins that equivalence on disk, not by argument.
    // Both indexes are built HERE (the suite-shared root accumulates
    // adds/compactions from other tests, so it is not a valid
    // fresh-train reference by the time this test runs)
    val fresh = TempRoots.freshForDir("graft_ivf_cbfresh", sfDir).toString
    Similarity.writeIvfIndex(history, fresh, nlist = 16, iters = 2)
    val copied = TempRoots.freshForDir("graft_ivf_cbcopy", sfDir).toString
    Similarity.writeIvfIndex(history, copied, nlist = 16, iters = 2,
      copyCodebooksFrom = Some(fresh))
    assert(Similarity.readIvfCodebook(spark, copied).map(_.toSeq).toSeq ==
      Similarity.readIvfCodebook(spark, fresh).map(_.toSeq).toSeq,
      "copied coarse codebook must equal the trained one")
    assert(Similarity.readPqCodebooks(spark, copied)
        .map(_.map(_.toSeq).toSeq) ==
      Similarity.readPqCodebooks(spark, fresh).map(_.map(_.toSeq).toSeq),
      "copied PQ codebooks must equal the trained ones")
    def lists(p: String) =
      spark.read.parquet(Similarity.ivfListsPath(spark, p))
      .orderBy($"vec_id").collect().toSeq.map(_.toString)
    assert(lists(copied) == lists(fresh),
      "assignment against copied books must equal the trained build")
    val probes = e.filter($"vec_id" % 50 === 7)
    def search(p: String) = Similarity
      .adcSearchPersisted(spark, p, probes, k = 5, nprobe = 4)
      .collect().toSeq.map(_.toString).sorted
    assert(search(copied) == search(fresh))
  }
}
