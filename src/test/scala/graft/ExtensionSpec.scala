package graft

import graft.catalyst.TextHash
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the extension operators that have no SQL oracle:
  * native hash expressions, SimHash semantics, LSH recall. */
class ExtensionSpec extends AnyFunSuite {
  import TestSession._

  private def rh(s: String) = TextHash.rollingHash(UTF8String.fromString(s))
  private def sh(s: String) = TextHash.simHash(UTF8String.fromString(s))

  test("rolling hash: deterministic, spread, range") {
    assert(rh("") === 0L)
    assert(rh("a") === 97L) // single byte = its value
    assert(rh("hello world") === rh("hello world"))
    assert(rh("hello world") !== rh("hello world!"))
    assert(rh("ab") !== rh("ba")) // order-sensitive
    val M = (1L << 61) - 1
    Seq("x", "hello", "a" * 1000).foreach { s =>
      assert(rh(s) >= 0 && rh(s) < M)
    }
  }

  test("rolling hash matches explicit mod-arithmetic reference") {
    // independent BigInt reference implementation
    def ref(s: String): Long = {
      val M = BigInt((1L << 61) - 1)
      s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 263 + (b & 0xff)) mod M).toLong
    }
    Seq("hello world", "spark graft engine", "ünïcödé ok", "a b c d e").foreach { s =>
      assert(rh(s) === ref(s), s"mismatch for '$s'")
    }
  }

  test("simhash: identical docs collide, near-identical are close, distinct are far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    assert(sh(base) === sh(base))
    // one token changed out of 13 → small hamming distance
    val near = base.replace("lazy", "sleepy")
    assert(ham(sh(base), sh(near)) <= 16)
    // disjoint token set → large distance
    val far = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    assert(ham(sh(base), sh(far)) >= 17)
    // token order must not matter (bag-of-words signature)
    assert(sh("aa bb cc") === sh("cc aa bb"))
  }

  test("expressions run inside the SQL engine (codegen path)") {
    import spark.implicits._
    val df = Seq("hello world", "graft").toDF("text")
      .select(TextHash.rolling_hash($"text").as("rh"), TextHash.sim_hash($"text").as("sh"))
    val rows = df.collect()
    assert(rows(0).getLong(0) === rh("hello world"))
    assert(rows(0).getLong(1) === sh("hello world"))
    assert(rows(1).getLong(0) === rh("graft"))
  }

  test("minhash LSH pairs equal exact jaccard pairs on fixtures") {
    val exact = SparkEntry.queries("q62_ngram_jaccard_pairs")(spark, sfDir)
      .collect().map(_.toSeq.take(2)).toSet
    val lsh = SparkEntry.queries("q63_minhash_lsh_pairs")(spark, sfDir)
      .collect().map(_.toSeq.take(2)).toSet
    assert(lsh === exact)
    assert(exact.nonEmpty, "fixtures should contain planted near-dups")
  }

  test("knn LSH: recall floor + candidate reduction on fixtures") {
    val brute = SparkEntry.queries("q66_knn_brute_force")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q67_knn_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    // Fixture embeddings are uniform random — LSH's worst case (no true
    // clusters). 2-bit multi-probe covers 37/256 of signature space, so
    // random-data recall ~= that coverage-weighted collision prob (~0.3);
    // assert a floor well above chance plus the efficiency property.
    assert(recall >= 0.15, s"LSH recall $recall below floor")
    assert(lsh.nonEmpty && lsh.size <= brute.size * 2)
  }

  test("knn IVF: recall floor + candidate reduction on fixtures") {
    val brute = SparkEntry.queries("q66_knn_brute_force")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("q97_knn_ivf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    // nprobe=2 of nlist=16 scans ~1/8 of the corpus, so random list
    // assignment would score ~0.125; measured recall on the fixtures is
    // 0.925 (sf0.001/0.01) to 1.0 (sf0.1) — the floor sits far above
    // chance with margin below the measurement, so a broken quantizer
    // (wrong codebook offset, bad norm ratio) cannot sneak through.
    assert(recall >= 0.6, s"IVF recall $recall below floor")
    assert(ivf.nonEmpty && ivf.size <= brute.size * 2)
  }

  test("native expressions are callable from SQL (injectFunction)") {
    import spark.implicits._
    Seq(("hello world", Seq(0.5f, 0.5f))).toDF("t", "v").createOrReplaceTempView("sqlfn_probe")
    val r = spark.sql("""
      SELECT rolling_hash(t) AS rh, sim_hash(t) AS sh,
             float_vec_dot(v, v) AS dot,
             size(shingle_hashes('a b c d')) AS n_shingles,
             size(minhash_sig(shingle_hashes('a b c d'), 8)) AS k
      FROM sqlfn_probe""").collect()(0)
    assert(r.getLong(0) === rh("hello world"))
    assert(r.getLong(1) === sh("hello world"))
    assert(r.getDouble(2) === 0.5)
    assert(r.getInt(3) === 2)
    assert(r.getInt(4) === 8)
  }

  test("source-level minhash sketch tracks exact jaccard, partition-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val est = SparkEntry.queries("q59_source_similarity")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // exact source-level shingle-set jaccard, computed independently
    val sets = graft.operators.Dedup.docShingles(spark, sfDir)
      .join(Tables.t(spark, sfDir, "documents").select($"doc_id", $"source"), "doc_id")
      .select($"source", explode($"sh").as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (src, rows) => src -> rows.map(_.getLong(1)).toSet }
    est.foreach { case ((s1, s2), e) =>
      val exact = {
        val (a, b) = (sets(s1), sets(s2))
        (a & b).size.toDouble / (a | b).size
      }
      assert(math.abs(e - exact) <= 0.25, s"($s1,$s2): est $e vs exact $exact")
    }
    // order/partitioning invariance: same result from repartitioned input
    val again = SparkEntry.queries("q59_source_similarity")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(again === est)
  }

  test("native hyperplane signature is bit-identical to the composed HOF form") {
    import graft.operators.Similarity
    import spark.implicits._
    val planes = Similarity.hyperplanes(32, seed = 7L)
    val diff = Tables.t(spark, sfDir, "embeddings")
      .select(
        Similarity.lshSignature($"embedding", planes).as("native"),
        Similarity.lshSignatureComposed($"embedding", planes).as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff === 0L)
  }

  test("banded source pairs: finds near-identical sources, ests agree with all-pairs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // controlled corpus: sources A and B share every text (est jaccard 1 →
    // every band matches, deterministically); C is disjoint
    val texts = (0 until 50).map(i => s"alpha bravo charlie delta echo token$i golf hotel india")
    val docs =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "srcA") } ++
        texts.zipWithIndex.map { case (t, i) => (i + 100L, t, "srcB") } ++
        (0 until 50).map(i => (i + 200L, s"zulu yankee xray whiskey victor other$i uniform tango sierra", "srcC"))
    val dir = java.nio.file.Files.createTempDirectory("graft_banded_src").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val banded = graft.operators.Dedup.bandedSourcePairs(spark, dir, minEst = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // near-identical pair surfaces (identical shingle sets → identical
    // sketches → every band matches); the disjoint source C never pairs
    assert(banded.keySet === Set(("srcA", "srcB")), s"got ${banded.keySet}")
    assert(banded(("srcA", "srcB")) === 1.0)
    // sub-quadratic guarantee on the real fixture: dissimilar sources
    // (est jaccard ~0.05 across the board per q59) produce NO banded
    // candidates at all — the candidate stage prunes the |sources|^2 term
    // entirely rather than estimating every pair like the crossJoin does
    val bandedFixture = graft.operators.Dedup.bandedSourcePairs(spark, sfDir, minEst = 0.0)
    assert(bandedFixture.count() === 0L)
  }

  test("q115 banded cohort pairs equal the exact all-pairs estimates above threshold") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the SAME cohort sketches q115 uses (shared cohortSketches helper —
    // both sides provably sketch the same groups), compared against the
    // exhaustive crossJoin of estimates: banding must lose nothing above
    // the threshold on the real fixture (LSH can in principle miss — this
    // pins the fixture outcome so a banding regression is loud), and
    // every surfaced pair must be adjacent windows (non-overlapping
    // cohorts pruned by the candidate stage)
    val k = 64
    val sigs = graft.operators.Dedup.cohortSketches(spark, sfDir, k)
    val a = sigs.select($"win".as("w1"), $"sig".as("sig1"))
    val b = sigs.select($"win".as("w2"), $"sig".as("sig2"))
    val exact = a.crossJoin(b).filter($"w1" < $"w2")
      .withColumn("est_jaccard",
        round(size(filter(zip_with($"sig1", $"sig2", (x, y) => x === y), p => p))
          .cast("double") / k, 4))
      .filter($"est_jaccard" >= 0.2)
      .select($"w1", $"w2", $"est_jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val banded = SparkEntry.queries("q115_cohort_similarity_banded")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(banded === exact, "banded pairs must equal exact all-pairs above threshold")
    assert(banded.nonEmpty, "adjacent cohorts must surface")
    assert(banded.keySet.forall { case (w1, w2) => w2 == w1 + 1 },
      s"only adjacent windows overlap: ${banded.keySet}")
  }

  test("neardup clusters are transitive: an A~B~C chain with A!~C forms one cluster") {
    import spark.implicits._
    // sliding 50-token windows over a 60-token sequence, shifted by 5:
    // adjacent windows share 43/53 shingles (jac 0.81 >= 0.8), the outer
    // pair only 38/58 (jac 0.66 < 0.8) — a genuine chain, clustered only
    // by transitivity
    def text(from: Int): String = (from until from + 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, text(1), "s"), (1L, text(6), "s"), (2L, text(11), "s"),
      (3L, (200 to 249).map(i => s"z$i").mkString(" "), "s")) // unrelated loner
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val pairs = graft.operators.Dedup.minhashLshPairs(spark, dir, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L), (1L, 2L)), s"chain pairs: $pairs")
    val clusters = graft.operators.Dedup.neardupClusters(spark, dir, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(0L -> 0L, 1L -> 0L, 2L -> 0L),
      s"A~B~C must collapse to one cluster (loner excluded): $clusters")
  }

  test("neardup clusters: reliable checkpoint path equals local, and demands a dir") {
    // without a checkpoint dir the reliable mode must fail loudly up
    // front, not midway through the propagation loop. Precondition is
    // asserted (not silently skipped): nothing else in the suite sets a
    // checkpoint dir — if that changes, this must be restructured, not
    // quietly lose its guard coverage.
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "another test set a checkpoint dir; the guard assertion below would be vacuous")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.neardupClusters(spark, sfDir, 0.8, reliable = true)
    }
    assert(e.getMessage.contains("setCheckpointDir"))
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck")
    try {
      spark.sparkContext.setCheckpointDir(ckDir.toString)
      val local = graft.operators.Dedup.neardupClusters(spark, sfDir, 0.8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rel = graft.operators.Dedup.neardupClusters(spark, sfDir, 0.8, reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rel === local)
      // the reliable pass actually wrote checkpoint data to the dir
      val walk = java.nio.file.Files.walk(ckDir)
      val wrote = try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally walk.close()
      assert(wrote > 0, "reliable mode must materialize to the checkpoint dir")
    } finally {
      // the session is JVM-shared across suites: restore the no-dir state
      // (setCheckpointDir(null) → Option(null) → None) and remove the temp
      // dir so suite ordering and same-JVM reruns stay hermetic. The
      // returned frames were fully collected above — no live RDD still
      // reads these checkpoint files.
      spark.sparkContext.setCheckpointDir(null)
      val walk = java.nio.file.Files.walk(ckDir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }

  test("pagerank: reliable checkpoint path equals local at any iteration count, and demands a dir") {
    // same contract as neardupClusters(reliable): loud failure without a
    // checkpoint dir, bit-identical ranks with one (integer fixed-point
    // makes 'identical' exact, not approximate), and real files written.
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "another test set a checkpoint dir; the guard assertion below would be vacuous")
    val e = intercept[IllegalArgumentException] {
      graft.operators.AnalyticsPatterns.pagerankInt(spark, sfDir, 3, reliable = true)
    }
    assert(e.getMessage.contains("setCheckpointDir"))
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck_pr")
    try {
      spark.sparkContext.setCheckpointDir(ckDir.toString)
      // 3 iterations (not q150's 2): exercises the per-iteration snap in
      // the regime where lineage would otherwise stack
      val local = graft.operators.AnalyticsPatterns.pagerankInt(spark, sfDir, 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val rel = graft.operators.AnalyticsPatterns
        .pagerankInt(spark, sfDir, 3, reliable = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rel === local)
      assert(local.nonEmpty)
      val walk = java.nio.file.Files.walk(ckDir)
      val wrote = try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally walk.close()
      assert(wrote > 0, "reliable mode must materialize to the checkpoint dir")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      val walk = java.nio.file.Files.walk(ckDir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }

  test("neardup clusters equal union-find over the pair graph") {
    val pairs = graft.operators.Dedup.minhashLshPairs(spark, sfDir, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // independent reference: classic union-find with path compression
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    val got = graft.operators.Dedup.neardupClusters(spark, sfDir, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(pairs.nonEmpty && got.nonEmpty)
  }

  test("MLlib MinHashLSH pairs equal exact jaccard pairs on fixtures") {
    val exact = SparkEntry.queries("q62_ngram_jaccard_pairs")(spark, sfDir)
      .collect().map(_.toSeq.take(2)).toSet
    val mllib = SparkEntry.queries("q69_mllib_minhash")(spark, sfDir)
      .collect().map(_.toSeq.take(2)).toSet
    assert(mllib === exact)
  }

  test("LSH embedding neardup: recall + reduction vs exact pairs") {
    val exact = SparkEntry.queries("q65_embedding_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q68_embedding_neardup_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH pairs must be a subset (exact confirm)")
    if (exact.nonEmpty) {
      val recall = (exact intersect lsh).size.toDouble / exact.size
      // threshold-0.45 pairs on uniform random vectors are barely above
      // ambient similarity — LSH's hard case; assert well above chance
      assert(recall >= 0.3, s"recall $recall")
    }
  }

  test("embedding neardup pairs are symmetric-free and thresholded") {
    val rows = SparkEntry.queries("q65_embedding_neardup")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.45)
    }
  }

  test("q306 binary-hamming top-10 recalls the exact top-5 far above " +
    "chance — the shortlist-generator contract") {
    // 1-bit quantization on UNIFORM-random embeddings is the quantizer's
    // worst case (cosines concentrate near 0, where sign bits carry the
    // least signal) — measured recall ~0.33 vs a chance baseline of
    // 10/499 ~ 0.02 for a random 10-of-corpus shortlist. The operator's
    // contract is q250's: a cheap shortlist the exact re-rank refines,
    // not a final ranking — so the gate is strictly-above-chance by an
    // order of magnitude, with the measured figure logged.
    val exact = SparkEntry.queries("q66_knn_brute_force")(spark, sfDir)
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ham = SparkEntry.queries("q306_binary_hamming_knn")(spark, sfDir)
      .select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ham).size.toDouble / exact.size
    assert(recall >= 0.15,
      s"hamming shortlist recall $recall below the above-chance gate")
    info(f"binary-hamming recall of exact top-5 in top-10: $recall%.2f " +
      "(chance ~ 0.02)")
  }
}
