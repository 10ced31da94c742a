package graft

import graft.catalyst.{TextHash, VecOps}
import graft.functions.{TopHit, TopKCosine}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the native kernels against independent
  * reference implementations (SURVEY §5: the reference repo has no
  * property tests — part of the richer test strategy). Uses seeded
  * ScalaCheck generators directly (no scalatestplus bridge offline), so
  * every run exercises the same 200 deterministic samples per property.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val token: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, token).map(_.mkString(" ")))

  test("rollingHash equals BigInt reference on arbitrary strings") {
    val M = BigInt((1L << 61) - 1)
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) => (h * 263 + (b & 0xff)) mod M).toLong
    forAll(Gen.asciiPrintableStr) { s =>
      assert(TextHash.rollingHash(UTF8String.fromString(s)) === ref(s))
    }
  }

  test("jaccard kernel equals Set-based reference (dups, any overlap)") {
    val arrGen = Gen.listOf(Gen.choose(0L, 30L))
    forAll(arrGen, arrGen) { (a, b) =>
      val got = VecOps.jaccard(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val (sa, sb) = (a.toSet, b.toSet)
      if (sa.isEmpty && sb.isEmpty) assert(got.isNaN) // surfaced as SQL NULL
      else assert(got === (sa & sb).size.toDouble / (sa | sb).size)
    }
  }

  test("hyperplaneSig equals per-plane sequential-dot reference") {
    val vec = Gen.listOfN(16, Gen.choose(-4.0f, 4.0f))
    val planes = Gen.listOfN(5, Gen.listOfN(16, Gen.choose(-1.0, 1.0)))
    forAll(vec, planes) { (v, ps) =>
      val flat = ps.flatten.toArray
      val got = VecOps.hyperplaneSig(
        new GenericArrayData(v.toArray), flat, 16)
      val want = ps.zipWithIndex.foldLeft(0L) { case (sig, (p, i)) =>
        var acc = 0.0
        var j = 0
        while (j < 16) { acc += v(j).toDouble * p(j); j += 1 }
        if (acc >= 0.0) sig | (1L << i) else sig
      }
      assert(got === want)
    }
  }

  test("topCentroids picks the nprobe max-cosine indices, ties to lower index") {
    val vec = Gen.listOfN(8, Gen.choose(-4.0f, 4.0f))
    val cents = Gen.listOfN(6, Gen.listOfN(8, Gen.choose(-1.0, 1.0)))
    forAll(vec, cents) { (v, cs) =>
      val flat = cs.flatten.toArray
      val cnorms = cs.map(c => math.sqrt(c.map(x => x * x).sum)).toArray
      val got = VecOps.topCentroids(
        new GenericArrayData(v.toArray), flat, cnorms, 8, 2)
      val vnorm = math.sqrt(v.map(x => x.toDouble * x).sum)
      val sims = cs.map { c =>
        var acc = 0.0
        var j = 0
        while (j < 8) { acc += v(j).toDouble * c(j); j += 1 }
        val cn = math.sqrt(c.map(x => x * x).sum)
        if (vnorm == 0.0 || cn == 0.0) 0.0 else acc / (vnorm * cn)
      }
      val want = sims.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(2).map(_._2)
      assert((0 until got.numElements()).map(got.getInt) === want)
    }
  }

  test("shingleHashes: count equals distinct string-shingle count") {
    forAll(text) { t =>
      val toks = t.trim.split(" ").filter(_.nonEmpty).toSeq
      val expected =
        if (t.trim.isEmpty) 1 // whole-(empty-)text fallback shingle
        else if (toks.length < 3) 1
        else toks.sliding(3).map(_.mkString("_")).toSet.size
      val got = VecOps.shingleHashes(UTF8String.fromString(t.trim), 3).numElements()
      assert(got === expected, s"text='$t'")
    }
  }

  test("shingleHashes is whitespace-run invariant and token-sequence faithful") {
    // identity depends only on the filtered token sequence
    val a = VecOps.shingleHashes(UTF8String.fromString("aa  bb cc dd"), 3)
    val b = VecOps.shingleHashes(UTF8String.fromString("aa bb  cc dd"), 3)
    assert(a.toLongArray().toSet === b.toLongArray().toSet)
    // underscore inside a token cannot collide with a shingle join
    val two = VecOps.shingleHashes(UTF8String.fromString("a b"), 3)
    val one = VecOps.shingleHashes(UTF8String.fromString("a_b"), 3)
    assert(two.toLongArray().toSet !== one.toLongArray().toSet)
    // <3-token fallback also whitespace-invariant
    val f1 = VecOps.shingleHashes(UTF8String.fromString("x  y"), 3)
    val f2 = VecOps.shingleHashes(UTF8String.fromString("x y"), 3)
    assert(f1.toLongArray().toSet === f2.toLongArray().toSet)
  }

  test("simHash is permutation-invariant over tokens") {
    forAll(Gen.listOf(token).suchThat(_.nonEmpty)) { toks =>
      val a = TextHash.simHash(UTF8String.fromString(toks.mkString(" ")))
      val b = TextHash.simHash(UTF8String.fromString(scala.util.Random.shuffle(toks).mkString(" ")))
      assert(a === b)
    }
  }

  test("minhash signature component-match estimates jaccard within bound") {
    val setGen = Gen.nonEmptyListOf(Gen.choose(0L, 2000L)).map(_.distinct)
    forAll(setGen, setGen) { (a, b) =>
      if (a.nonEmpty && b.nonEmpty) {
        val k = 128
        val sa = VecOps.minhash(new GenericArrayData(a.toArray), k)
        val sb = VecOps.minhash(new GenericArrayData(b.toArray), k)
        val matches = (0 until k).count(i => sa.getLong(i) == sb.getLong(i))
        val est = matches.toDouble / k
        val exact = (a.toSet & b.toSet).size.toDouble / (a.toSet | b.toSet).size
        // stderr = sqrt(j(1-j)/k) <= 0.0442; allow 5 sigma
        assert(math.abs(est - exact) <= 0.23, s"est $est exact $exact")
      }
    }
  }

  test("TopKCosine reduce/merge equals sort-take-k under any split") {
    val hitGen = for {
      id <- Gen.choose(0L, 50L)
      c <- Gen.choose(-1000, 1000).map(_ / 1000.0)
    } yield TopHit(id, c)
    forAll(Gen.listOf(hitGen), Gen.choose(0, 10)) { (hits: List[TopHit], splitAt: Int) =>
      val agg = new TopKCosine(5)
      val ref = hits.sortWith((x, y) =>
        x.cos > y.cos || (x.cos == y.cos && x.vec_id < y.vec_id)).take(5)
      val (h1, h2) = hits.splitAt(math.min(splitAt, hits.length))
      val b1 = h1.foldLeft(agg.zero)(agg.reduce)
      val b2 = h2.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(b1, b2)) === ref)
    }
  }

  test("FirstKByKey reduce/merge equals sort-take-k under any split") {
    import graft.functions.{FirstKByKey, SampleHit}
    val hitGen = for {
      rk <- Gen.choose(0, 30).map(i => f"$i%02d")
      key <- Gen.choose(0L, 50L)
    } yield SampleHit(rk, key, key * 1.5)
    forAll(Gen.listOf(hitGen), Gen.choose(0, 10)) { (hits: List[SampleHit], splitAt: Int) =>
      val agg = new FirstKByKey(5)
      val ref = hits.sortWith((a, b) =>
        a.rk < b.rk || (a.rk == b.rk && a.key < b.key)).take(5)
      val (h1, h2) = hits.splitAt(math.min(splitAt, hits.length))
      val b1 = h1.foldLeft(agg.zero)(agg.reduce)
      val b2 = h2.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(agg.merge(b1, b2)) === ref)
    }
  }

  test("q134 CMS estimates dominate exact counts within the eps bound") {
    import TestSession._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = SparkEntry.queries("q134_cms_heavy_hitters")(spark, sfDir).collect()
    assert(out.length === 10)
    val nTotal = Tables.t(spark, sfDir, "documents")
      .select(split($"text", " ").as("w")).filter(size($"w") >= 2)
      .select((size($"w") - 1).cast("long").as("n")).agg(sum($"n")).head().getLong(0)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(r.getBoolean(3) && est >= exact,
        s"CMS must never underestimate: ${r.getString(0)} est=$est exact=$exact")
      // eps=0.001 at 0.99 confidence; 3x headroom + small-count floor
      assert(est - exact <= math.max(5L, (0.003 * nTotal).toLong),
        s"CMS overestimate beyond bound: ${r.getString(0)} est=$est exact=$exact N=$nTotal")
    }
  }

  test("bpeApplyMerge equals the index-scan reference on adversarial symbol runs") {
    // the fold-with-last formulation vs the classic two-pointer scan, on
    // a deliberately tiny alphabet with composite symbols ("ab", "ba") so
    // overlapping runs (a a a), pair-equals-merged collisions, and
    // absent-pair identity all occur within 200 samples. Evaluated as ONE
    // Spark job: every sample is a column over a single row.
    import org.apache.spark.sql.functions._
    val spark = TestSession.spark
    val sym: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "ba")
    val caseGen = Gen.zip(
      Gen.choose(0, 12).flatMap(Gen.listOfN(_, sym)), sym, sym)
    val samples = scala.collection.mutable.ArrayBuffer[(List[String], String, String)]()
    var seed = Seed(7L)
    while (samples.length < 200) {
      caseGen.apply(Gen.Parameters.default, seed).foreach(samples += _)
      seed = seed.next
    }
    def ref(syms: List[String], a: String, b: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val cols = samples.zipWithIndex.map { case ((syms, a, b), i) =>
      graft.functions.TextAnalysis
        .bpeApplyMerge(typedLit(syms), a, b).as(s"c$i")
    }
    val row = spark.range(1).select(cols.toSeq: _*).head()
    samples.zipWithIndex.foreach { case ((syms, a, b), i) =>
      val got = row.getSeq[String](i).toList
      assert(got === ref(syms, a, b), s"case $i: syms=$syms pair=($a,$b)")
      assert(got.mkString === syms.mkString,
        s"case $i: a merge must never create or lose characters")
    }
  }

  test("bitmap aggregates: set semantics, union merge, partition " +
    "invariance, loud dense-domain guard") {
    import TestSession.spark
    import graft.catalyst.BitmapAgg._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // duplicates are idempotent, cardinality is the distinct count,
    // and the answer is identical at 1 and 32 partitions (merge = OR
    // is commutative/associative)
    val ids = Seq(3L, 3L, 7L, 0L, 1024L, 7L, 65L)
    def card(parts: Int): Long = ids.toDF("id").repartition(parts)
      .agg(bitmap_agg($"id").as("bm"))
      .select(bitmap_card($"bm")).head().getLong(0)
    assert(card(1) == 5L && card(32) == 5L)
    // OR-union of group bitmaps equals the distinct of the union
    val two = Seq((0, 3L), (0, 7L), (1, 7L), (1, 9L)).toDF("g", "id")
      .groupBy($"g").agg(bitmap_agg($"id").as("bm"))
      .agg(bitmap_or_card_agg($"bm")).head().getLong(0)
    assert(two == 3L, s"union of {3,7} and {7,9} must be 3, got $two")
    // a hash-like id must fail loudly, never allocate gigabytes
    val ex = intercept[Exception] {
      Seq(Long.MaxValue).toDF("id")
        .agg(bitmap_agg($"id")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("z_interleave16 equals the per-bit reference and round-trips " +
    "through codegen") {
    import graft.catalyst.ZOrder
    def ref(a: Long, b: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    forAll(Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))) {
      case (a, b) =>
        assert(ZOrder.interleave16(a, b) == ref(a, b),
          s"spread16 magic-number kernel diverges at ($a, $b)")
    }
    // monotone locality sanity: fixing b, z is monotone in a
    assert(ZOrder.interleave16(5, 9) < ZOrder.interleave16(6, 9))
    // the Catalyst expression (whole-stage codegen path) agrees
    import TestSession._
    import spark.implicits._
    val rows = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
      .toDF("a", "b")
      .select($"a", $"b", ZOrder.z_interleave16($"a", $"b").as("z"))
      .collect()
    rows.foreach(r => assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1))))
  }

  test("q270 grid join: histogram equals the quadratic ground truth and " +
    "the grid prunes the candidate space") {
    import TestSession._
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q270_spatial_grid_join")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force ground truth, same derived geometry
    val M = 2147483647L
    def pts(t: String, k: String, m1: Long, m2: Long) =
      Tables.t(spark, sfDir, t).select(
        ((col(k) * m1) % M % 200).as(s"${t}_x"),
        ((col(k) * m2) % M % 200).as(s"${t}_y"))
    val brute = pts("customer", "c_custkey", 48271L, 16807L)
      .crossJoin(pts("supplier", "s_suppkey", 69621L, 40692L))
      .filter(abs(col("customer_x") - col("supplier_x")) <= 10 &&
        abs(col("customer_y") - col("supplier_y")) <= 10)
      .select(greatest(abs(col("customer_x") - col("supplier_x")),
        abs(col("customer_y") - col("supplier_y"))).as("d"))
      .groupBy(col("d")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute, s"grid join missed or duplicated pairs: " +
      s"grid $got vs brute $brute")
    // candidate pruning: 9 cells x small side << the full cross product
    val nC = Tables.t(spark, sfDir, "customer").count()
    val nS = Tables.t(spark, sfDir, "supplier").count()
    assert(9 * nS * nC / 400 < nC * nS / 10,
      "the 20x20 cell domain must keep expected candidates under 10% " +
        "of the cross product")
  }

  test("q271 weighted percentiles: thresholds bracket the mass and the " +
    "weighted p50 differs from the unweighted when weights skew") {
    import TestSession._
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q271_weighted_percentile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = rows("p50")._2
    assert(rows.values.forall(_._2 == w))
    // independent replay: weighted CDF in plain Scala
    val mass = Tables.t(spark, sfDir, "lineitem")
      .selectExpr("cast(round(l_extendedprice) as bigint) as d",
        "cast(l_quantity as bigint) as w")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    assert(mass.map(_._2).sum == w)
    def pick(pct: Int): Long = {
      var cum = 0L
      mass.collectFirst {
        case (d, m) if { cum += m; cum * 100 >= pct * w } => d
      }.get
    }
    Seq(("p50", 50), ("p90", 90), ("p99", 99)).foreach { case (l, p) =>
      assert(rows(l)._1 == pick(p), s"$l: ${rows(l)._1} vs ${pick(p)}")
    }
  }

  test("q272/q273: the cascade certifies zero orphans and every declared " +
    "FK edge is clean in the fixtures") {
    import TestSession._
    val cascade = SparkEntry.queries("q272_forget_cascade")(spark, sfDir)
      .collect()
    assert(cascade.length == 3)
    cascade.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"before = deleted + after must hold: $r")
      assert(r.getLong(4) == 0L, s"cascade left orphans: $r")
    }
    // the lineitem deletion must be at least the orders deletion (each
    // deleted order has >= 1 line in TPC-H-ish data) when any fired
    val byTbl = cascade.map(r => r.getString(0) -> r.getLong(2)).toMap
    if (byTbl("orders") > 0)
      assert(byTbl("lineitem") >= byTbl("orders"))
    val audit = SparkEntry.queries("q273_fk_orphan_audit")(spark, sfDir)
      .collect()
    assert(audit.length == 6)
    audit.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
        s"fixture FK edge must be clean: $r")
    }
  }

  test("q274 Horvitz-Thompson: estimator replays exactly and lands " +
    "within a plausible sampling error") {
    import TestSession._
    val r = SparkEntry.queries("q274_horvitz_thompson")(spark, sfDir).head()
    val (truth, nP, nS, est, errBp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nS > 0 && nS < nP, "the 7% user sample must be a proper subset")
    // sign and magnitude consistency of the emitted error
    val expectErr = {
      val d = est - truth
      (if (d < 0) -1L else 1L) * (math.abs(d) * 10000 / truth)
    }
    assert(errBp == expectErr)
    // cluster sampling at sf0.001 keeps only ~20 users, so the error
    // can legitimately reach tens of percent (measured -52.8% here —
    // 2.4 cluster-level standard errors); the structural check is that
    // the estimate is neither zero nor a multiple of the truth, which
    // is what a broken inclusion rule produces
    assert(math.abs(errBp) < 9999, s"HT estimate degenerate: $errBp bp")
  }

  test("q262 vocab growth: curves monotone, totals close over the corpus") {
    import TestSession._
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q262_vocab_growth")(spark, sfDir)
      .collect()
    // cumulative columns strictly reconstruct the per-bucket columns
    assert(rows.map(_.getLong(1)).sum == rows.last.getLong(4)) // docs
    assert(rows.map(_.getLong(2)).sum == rows.last.getLong(5)) // tokens
    assert(rows.map(_.getLong(3)).sum == rows.last.getLong(6)) // types
    Seq(4, 5, 6).foreach { i =>
      val c = rows.map(_.getLong(i))
      assert(c.zip(c.tail).forall { case (a, b) => a <= b },
        s"cumulative column $i must be non-decreasing")
    }
    // final totals equal independent corpus-wide counts
    val docs = Tables.t(spark, sfDir, "documents")
    assert(rows.last.getLong(4) == docs.count())
    val tok = docs.select(explode(split(trim(col("text")), " ")).as("t"))
    assert(rows.last.getLong(5) == tok.count())
    assert(rows.last.getLong(6) == tok.distinct().count(),
      "cum_types at the last bucket must equal corpus distinct types")
    // Heaps: type growth decelerates — later-half new types < first bucket
    assert(rows.last.getLong(3) < rows.head.getLong(3),
      "a natural corpus must mint fewer new types in its last decile")
  }

  test("q263 zipf fit: slope negative near -1e6, floats agree with the " +
    "integer rationals") {
    import TestSession._
    val r = SparkEntry.queries("q263_zipf_fit")(spark, sfDir).head()
    val (n, cov, varx) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // n = min(1000, distinct types) — sf0.001's corpus has few types
    val types = Tables.t(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.col("text")), " ")))
      .distinct().count()
    assert(n == math.min(1000L, types), s"n $n vs min(1000, $types)")
    assert(cov < 0 && varx > 0,
      s"rank-frequency covariance must be negative: cov=$cov varx=$varx")
    val slope = r.getLong(3)
    assert(slope < 0 && slope > -3000000L,
      s"floor-log2 Zipf slope expected in (-3, 0): $slope micro")
    val r2 = r.getLong(5)
    assert(r2 >= 0 && r2 <= 10000, s"r2_bp out of range: $r2")
    // the micro-floored slope matches the exact rational within 1 micro
    val exact = BigDecimal(cov) * 1000000 / BigDecimal(varx)
    assert((BigDecimal(slope) - exact).abs <= 1,
      s"slope_micro $slope vs rational $exact")
  }

  test("Hilbert.xy2d is a space-filling curve: a bijection onto " +
    "[0, n^2) whose CONSECUTIVE indexes are grid-adjacent — proven " +
    "exhaustively over the full 16x16 grid (bits=4)") {
    val bits = 4; val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (graft.catalyst.Hilbert.xy2d(bits, x, y), (x, y))
    val ds = cells.map(_._1)
    assert(ds.sorted == (0L until (n.toLong * n)),
      "indexes must be a permutation of [0, n^2)")
    val byD = cells.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d-consecutive cells ($x1,$y1)->($x2,$y2) must be grid " +
          "neighbors — the Hilbert property Morton does NOT have")
    }
    // Morton genuinely lacks this — the property test proves the two
    // expressions are different curves, not two spellings of one
    val zByD = (for (x <- 0 until n; y <- 0 until n)
      yield (graft.catalyst.ZOrder.interleave16(x, y), (x, y)))
      .sortBy(_._1).map(_._2)
    val zJumps = zByD.sliding(2).count {
      case Seq((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(zJumps > 0, "Morton must show diagonal jumps on this grid")
  }

  test("HilbertIndex expression eval agrees with the Scala walk and " +
    "masks out-of-range coordinates") {
    forAll(Gen.zip(Gen.chooseNum(0L, 1L << 20), Gen.chooseNum(0L, 1L << 20))) {
      case (x, y) =>
        val e = graft.catalyst.HilbertIndex(
          org.apache.spark.sql.catalyst.expressions.Literal(x),
          org.apache.spark.sql.catalyst.expressions.Literal(y), 8)
        assert(e.eval(null) == graft.catalyst.Hilbert.xy2d(8, x, y))
        assert(graft.catalyst.Hilbert.xy2d(8, x, y) ==
          graft.catalyst.Hilbert.xy2d(8, x & 255, y & 255),
          "coordinates above 2^bits must mask, not corrupt the walk")
    }
  }

  // ---- Damerau-Levenshtein kernel (q408) --------------------------------

  private def dl(a: String, b: String): Int =
    graft.catalyst.DamerauLev.dist(
      UTF8String.fromString(a), UTF8String.fromString(b))

  /** Plain Levenshtein reference (independent of the kernel's DP). */
  private def levRef(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  /** Restricted OSA reference — an UPPER bound on unrestricted DL. */
  private def osaRef(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to s.length; j <- 1 to t.length) {
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      if (i > 1 && j > 1 && s(i - 1) == t(j - 2) && s(i - 2) == t(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(s.length)(t.length)
  }

  private val smallStr: Gen[String] = Gen.choose(0, 8)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))

  test("DamerauLev pins the textbook values that separate unrestricted " +
    "DL from OSA and from plain Levenshtein") {
    // The defining case: OSA says 3 (may not edit a transposed pair
    // again), unrestricted DL says 2 (DuckDB's damerau_levenshtein
    // agrees — the oracle contract of q408).
    assert(dl("ca", "abc") === 2)
    assert(osaRef("ca", "abc") === 3)
    assert(dl("ab", "ba") === 1)      // one adjacent transposition
    assert(levRef("ab", "ba") === 2)  // costs two substitutions
    assert(dl("abcdef", "abcfed") === 2)
    assert(dl("kitten", "sitting") === 3) // no transpositions: = lev
    assert(dl("", "abc") === 3)
    assert(dl("abc", "") === 3)
    assert(dl("", "") === 0)
  }

  test("DamerauLev is bounded by OSA and Levenshtein, bounded below by " +
    "the length gap, identity-zero and symmetric") {
    forAll(Gen.zip(smallStr, smallStr)) { case (a, b) =>
      val d = dl(a, b)
      assert(d <= osaRef(a, b), s"dl > osa on ($a, $b)")
      assert(osaRef(a, b) <= levRef(a, b), s"osa > lev on ($a, $b)")
      assert(d >= math.abs(a.length - b.length))
      assert(d === dl(b, a), s"asymmetric on ($a, $b)")
      assert(dl(a, a) === 0)
    }
  }

  test("DamerauLev satisfies the triangle inequality (the metric " +
    "property OSA famously violates)") {
    forAll(Gen.zip(smallStr, smallStr, smallStr)) { case (a, b, c) =>
      assert(dl(a, c) <= dl(a, b) + dl(b, c),
        s"triangle violated on ($a, $b, $c)")
    }
  }

  test("DamerauLevenshtein expression eval path matches the static " +
    "kernel and handles code points above the BMP as single units") {
    forAll(Gen.zip(smallStr, smallStr)) { case (a, b) =>
      val e = graft.catalyst.DamerauLevenshtein(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(a),
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(b),
          org.apache.spark.sql.types.StringType))
      assert(e.eval(null) === dl(a, b))
    }
    // U+1F600 is a surrogate pair in UTF-16; as a code point it is ONE
    // edit unit: swapping it with an adjacent ASCII char is one
    // transposition, not a char-level scramble.
    val smiley = new String(Character.toChars(0x1F600))
    assert(dl(s"a$smiley", s"${smiley}a") === 1)
    assert(dl(smiley, "") === 1)
  }

  // ---- KLL quantile sketch (q410) ---------------------------------------

  import graft.catalyst.QuantileSketch

  private def weightMass(s: QuantileSketch.Sketch): Long =
    (0 until s.numLevels).map(h => (1L << h) * s.levels(h).size).sum

  /** Deterministic value stream: the portable Knuth mix over 0..n-1 —
    * shuffled-looking, reproducible, with duplicates. */
  private def stream(n: Int): Array[Long] =
    Array.tabulate(n)(i => (i.toLong * 2654435761L + 987654321L) % 100000L)

  private def countLe(sorted: Array[Long], x: Long): Long = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  private def countLt(sorted: Array[Long], x: Long): Long =
    countLe(sorted, x - 1)

  /** The tie-aware KLL guarantee (values may repeat, so a returned
    * value OCCUPIES a rank interval [R<(v)+1, R<=(v)]; the certificate
    * says that interval comes within errBound of the target):
    * R<=(est) >= t - E  and  R<(est) <= t + E - 1. */
  private def assertCertificate(s: QuantileSketch.Sketch,
      sorted: Array[Long]): Unit = {
    assert(weightMass(s) === s.n,
      "compaction must conserve total weight exactly")
    val e = s.errBound
    Seq(1L, 10L, 25L, 50L, 75L, 90L, 99L).foreach { p =>
      val t = math.max(1L, p * s.n / 100L)
      val est = s.quantileAtRank(t)
      val rLe = countLe(sorted, est)
      val rLt = countLt(sorted, est)
      assert(rLe >= t - e,
        s"p$p: R<=(est)=$rLe below target $t - errBound $e")
      assert(rLt <= t + e - 1,
        s"p$p: R<(est)=$rLt above target $t + errBound $e - 1")
    }
  }

  test("KLL sketch is exact (errBound 0) below capacity and on " +
    "constant input") {
    val s = new QuantileSketch.Sketch(1024)
    val vs = stream(500)
    vs.foreach(s.insert)
    assert(s.errBound === 0L)
    val sorted = vs.sorted
    Seq(1L, 250L, 500L).foreach { t =>
      assert(s.quantileAtRank(t) === sorted((t - 1).toInt))
    }
    val c = new QuantileSketch.Sketch(64)
    (1 to 10000).foreach(_ => c.insert(42L))
    assert(c.quantileAtRank(1L) === 42L)
    assert(c.quantileAtRank(c.n / 2) === 42L)
    assert(weightMass(c) === 10000L)
  }

  test("KLL certificate bounds true rank error at 100k inserts and " +
    "stays under the 2nL/k theory ceiling") {
    val vs = stream(100000)
    val s = new QuantileSketch.Sketch(256)
    vs.foreach(s.insert)
    assertCertificate(s, vs.sorted)
    val lTheory = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, s.n / 256)) + 2
    assert(s.errBound <= 2L * s.n * lTheory / 256 + 1,
      s"errBound ${s.errBound} above theory for n=${s.n}, k=256")
  }

  test("KLL certificate holds under every merge shape: sequential " +
    "4-way, sequential 32-way, and an adversarial pairwise tree") {
    val vs = stream(100000)
    val sorted = vs.sorted
    def build(chunk: Array[Long]): QuantileSketch.Sketch = {
      val s = new QuantileSketch.Sketch(256)
      chunk.foreach(s.insert)
      s
    }
    Seq(4, 32).foreach { ways =>
      val parts = vs.grouped((vs.length + ways - 1) / ways)
        .map(build).toSeq
      val acc = parts.head
      parts.tail.foreach(acc.merge)
      assert(acc.n === vs.length.toLong)
      assertCertificate(acc, sorted)
    }
    // adversarial: balanced pairwise tree (the shape a parallel
    // combiner produces), 32 leaves
    var layer = vs.grouped((vs.length + 31) / 32).map(build).toSeq
    while (layer.size > 1) {
      layer = layer.grouped(2).map { pair =>
        if (pair.size == 2) { pair.head.merge(pair(1)); pair.head }
        else pair.head
      }.toSeq
    }
    assert(layer.head.n === vs.length.toLong)
    assertCertificate(layer.head, sorted)
  }

  test("KLL serialization round-trips bit-identically and preserves " +
    "behavior") {
    val s = new QuantileSketch.Sketch(128)
    stream(20000).foreach(s.insert)
    val bytes = s.serialize()
    val back = QuantileSketch.deserialize(bytes)
    assert(java.util.Arrays.equals(back.serialize(), bytes))
    assert(back.n === s.n && back.errBound === s.errBound)
    Seq(1L, 5000L, 10000L, 20000L).foreach { t =>
      assert(back.quantileAtRank(t) === s.quantileAtRank(t))
    }
    // a deserialized sketch keeps merging correctly
    val other = new QuantileSketch.Sketch(128)
    stream(5000).foreach(other.insert)
    back.merge(other)
    assert(back.n === 25000L)
    assert(weightMass(back) === 25000L)
  }
}
