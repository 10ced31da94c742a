package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-math properties of the round-10 closed forms — the pieces whose
  * correctness the SQL oracles can only witness at fixture sizes, proven
  * here over the full parameter range (KernelPropertySpec's discipline
  * applied to this round's formulas).
  */
class Round10KernelSpec extends AnyFunSuite {

  test("q340 chunk-start formula: full coverage, no redundant tail, " +
    "for every doc length 1..500") {
    val (win, stride) = (32, 24)
    for (len <- 1 to 500) {
      val upper = math.max(len - win + stride, 1)
      val starts = 1 to upper by stride
      assert(starts.nonEmpty, s"len=$len produced no chunks")
      // full coverage: the last chunk reaches the end of the doc
      val lastEnd = math.min(starts.last + win - 1, len)
      assert(lastEnd == len, s"len=$len: coverage stops at $lastEnd")
      // no fully-redundant chunk: each chunk past the first must add at
      // least one token position the previous chunk did not cover
      starts.sliding(2).foreach {
        case Seq(a, b) =>
          val prevEnd = math.min(a + win - 1, len)
          val curEnd = math.min(b + win - 1, len)
          assert(curEnd > prevEnd,
            s"len=$len: chunk at $b adds nothing past $prevEnd")
        case _ => ()
      }
      // and the NEXT start (the one the upper bound excluded) truly
      // would have been redundant — the bound is tight, not just safe
      val next = starts.last + stride
      if (next <= len) {
        val lastCovered = math.min(starts.last + win - 1, len)
        assert(math.min(next + win - 1, len) <= lastCovered,
          s"len=$len: excluded start $next would have added coverage")
      }
    }
  }

  test("q338 geometric inverse-CDF literals: masses are the exact " +
    "two-sided alpha=1/2 distribution with tails folded into +-20") {
    val cum = Seq(2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L,
      1024L, 2048L, 4096L, 8192L, 16384L, 32768L, 65536L, 131072L,
      262144L, 524288L, 1048576L, 2097152L, 2621440L, 2883584L,
      3014656L, 3080192L, 3112960L, 3129344L, 3137536L, 3141632L,
      3143680L, 3144704L, 3145216L, 3145472L, 3145600L, 3145664L,
      3145696L, 3145712L, 3145720L, 3145724L, 3145726L, 3145728L)
    assert(cum.length == 41)
    assert(cum.last == 3L << 20, "total mass must be 3*2^20")
    assert(cum == cum.sorted && cum.distinct == cum, "CDF must be strict")
    // noise value for a uniform draw u in [0, 3*2^20) is
    // count(thresholds <= u) - 20; P(k) should be (1/3)(1/2)^|k| of the
    // total mass for |k| < 20, with the two tail buckets absorbing the
    // remaining geometric mass (sum_{j>=20} = 2 * base(20))
    val masses = cum.head +: cum.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    def base(k: Int): Long = (3145728L / 3) >> math.abs(k) // (1/3)(1/2)^|k|
    for (k <- -19 to 19)
      assert(masses(k + 20) == base(k), s"mass at k=$k")
    assert(masses(0) == 2 * base(20), "folded left tail")
    assert(masses(40) == 2 * base(20), "folded right tail")
    // symmetry: P(k) == P(-k) everywhere
    for (k <- 0 to 20)
      assert(masses(20 + k) == masses(20 - k), s"symmetry at $k")
  }

  test("q336/q341/q347 half-bit quantizer: length(bin(x*x))-1 equals " +
    "floor(2*log2 x) for all x in 1..200000") {
    var x = 1L
    while (x <= 200000L) {
      val hb = java.lang.Long.toBinaryString(x * x).length - 1
      val exact = math.floor(2.0 * (math.log(x.toDouble) / math.log(2.0)))
      // the doubles are exact here: x*x <= 4e10 << 2^53
      assert(hb.toDouble == exact, s"x=$x: hb=$hb exact=$exact")
      x += 1
    }
  }

  test("q346 VAD island trick: frame_id minus active-rank is constant " +
    "exactly within maximal runs") {
    // brute-force every activity pattern of length 8
    for (mask <- 0 until 256) {
      val active = (0 until 8).filter(i => ((mask >> i) & 1) == 1)
      val groups = active.zipWithIndex.map { case (fid, rk) => fid - rk }
      // number of distinct group keys == number of maximal runs
      val runs = active.foldLeft(List.empty[List[Int]]) {
        case (acc, f) if acc.nonEmpty && acc.head.head == f - 1 =>
          (f :: acc.head) :: acc.tail
        case (acc, f) => List(f) :: acc
      }.size
      assert(groups.distinct.size == runs, s"mask=$mask")
    }
  }
}
