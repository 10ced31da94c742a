package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT one-task-per-shard exchange without range partitioning.
  *
  * `repartitionByRange(n, shard)` gives the desired
  * one-partition-per-shard-value layout but pays a bounds-SAMPLING
  * pass that evaluates the whole child plan a second time — for a
  * shard write whose child is the two-window rank kernel (or a full
  * CDC merge), that second evaluation was the single largest job in
  * the storage-lifecycle profiles. Plain hash repartitioning runs the
  * child once but collides shard ids (pmod(hash(k), n) is not a
  * bijection): ~1/e of the write tasks end up empty and others carry
  * 2-3 shards.
  *
  * This uses what the engine knows and the optimizer does not (the
  * guide §8 discipline): the shard domain is KNOWN EXACTLY, so for
  * each domain value we precompute (driver-side, cached per n) an
  * integer PREIMAGE j with `pmod(murmur3(j, seed=42), n) == index` —
  * exactly the partition-id expression Spark's HashPartitioning
  * evaluates — and route each row through `element_at` on the literal
  * preimage map. Shard k lands in partition index(k), one task per
  * shard, the child evaluates ONCE, and the partition index equals the
  * domain position (file naming matches the range layout's). The
  * preimage search is O(n log n) expected driver work, cached;
  * domains beyond 65536 values fall back to range partitioning (a
  * literal map that size would bloat every task's serialized plan).
  */
object ShardExchange {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()

  /** preimages(n)(i) = smallest j >= 0 with
    * pmod(Murmur3_x86_32.hashInt(j, 42), n) == i — the exact partition
    * arithmetic of HashPartitioning over one int column. */
  private[sink] def preimages(n: Int): Array[Int] =
    cache.computeIfAbsent(n, _ => {
      val out = Array.fill(n)(-1)
      var found = 0
      var j = 0
      while (found < n) {
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(j, 42)
        val k = ((h % n) + n) % n
        if (out(k) < 0) { out(k) = j; found += 1 }
        j += 1
        require(j < Int.MaxValue, s"preimage search overflow for n=$n")
      }
      out
    })

  /** One exchange, `domain.size` partitions, each domain value in its
    * own partition (partition index = position in `domain`). Values
    * outside `domain` (callers pass the exact routing domain, so none
    * in practice) still land in SOME partition — correctness never
    * depends on the placement, only task balance does. */
  def exact(df: DataFrame, domain: Seq[Int], shardCol: Column)
      : DataFrame = {
    val n = domain.size
    if (n > 65536)
      return df.repartitionByRange(n, shardCol)
    val pre = preimages(n)
    val keys = domain.toArray
    val vals = keys.indices.map(i => pre(i)).toArray
    df.repartition(n,
      element_at(
        map_from_arrays(lit(keys), lit(vals)),
        shardCol.cast("int")))
  }
}
