package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored item inside the top-k sketch. */
final case class TopHit(vec_id: Long, cos: Double)

/** Exact bounded top-k aggregator (SURVEY §2B "custom Aggregator for
  * exact top-k cosine"; §7 hard-part 3): keeps at most k (cos desc,
  * vec_id asc) hits per group, so aggregation state is O(k) regardless of
  * group size — the property that lets an exact top-k run as a single
  * partial+final aggregation over 100 TB instead of a per-group global
  * sort. Registered through `udaf(...)`, so Catalyst plans it like any
  * built-in aggregate (map-side partials included).
  *
  * Contrast with the window formulation (q66: row_number over cos desc):
  * that shuffles EVERY candidate row to sort it; this shuffles only k
  * rows per group per map task.
  */
final class TopKCosine(k: Int) extends Aggregator[TopHit, Seq[TopHit], Seq[TopHit]] {

  private def lt(a: TopHit, b: TopHit): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.vec_id < b.vec_id)

  /** Insert keeping the buffer sorted (size <= k, so linear is fine). */
  private def insert(buf: Seq[TopHit], h: TopHit): Seq[TopHit] = {
    if (buf.size >= k && !lt(h, buf.last)) buf
    else ((buf :+ h).sortWith(lt)).take(k)
  }

  override def zero: Seq[TopHit] = Seq.empty
  override def reduce(buf: Seq[TopHit], h: TopHit): Seq[TopHit] = insert(buf, h)
  override def merge(a: Seq[TopHit], b: Seq[TopHit]): Seq[TopHit] =
    (a ++ b).sortWith(lt).take(k)
  override def finish(buf: Seq[TopHit]): Seq[TopHit] = buf
  override def bufferEncoder: Encoder[Seq[TopHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopHit]]()
  override def outputEncoder: Encoder[Seq[TopHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopHit]]()
}

/** One sampled row inside the bounded reservoir: the md5 rank key plus
  * the carried payload columns. */
final case class SampleHit(rk: String, key: Long, payload: Double)

/** Exact bounded FIRST-k-by-rank-key aggregator — the scale path q107's
  * window formulation documents ("swap row_number for the bounded
  * per-partition top-k Aggregator"): keeps at most k (rk asc, key asc)
  * rows per group, so a stratum NEVER materializes on one task — state
  * is O(k) with map-side partials, vs the window form that shuffles and
  * sorts every stratum row. With rk = md5(key) this is deterministic
  * reservoir sampling: the same k winners as the q107 window, from a
  * plan that survives a billion-row stratum. */
final class FirstKByKey(k: Int)
    extends Aggregator[SampleHit, Seq[SampleHit], Seq[SampleHit]] {
  require(k > 0, s"FirstKByKey needs k > 0, got $k") // fail at plan, not in a task

  private def lt(a: SampleHit, b: SampleHit): Boolean =
    a.rk < b.rk || (a.rk == b.rk && a.key < b.key)

  override def zero: Seq[SampleHit] = Seq.empty
  override def reduce(buf: Seq[SampleHit], h: SampleHit): Seq[SampleHit] =
    if (buf.size >= k && !lt(h, buf.last)) buf
    else ((buf :+ h).sortWith(lt)).take(k)
  override def merge(a: Seq[SampleHit], b: Seq[SampleHit]): Seq[SampleHit] =
    (a ++ b).sortWith(lt).take(k)
  override def finish(buf: Seq[SampleHit]): Seq[SampleHit] = buf
  override def bufferEncoder: Encoder[Seq[SampleHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleHit]]()
  override def outputEncoder: Encoder[Seq[SampleHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SampleHit]]()
}

/** One scored PAIR inside the bounded top-k sketch (q195): an
  * (id, id) edge plus its integer similarity score. */
final case class PairHit(v1: Long, v2: Long, score: Long)

/** Exact bounded top-k PAIRS aggregator — [[TopKCosine]]'s shape for
  * edge-valued groups (q195's cross-label mining): keeps at most k
  * (score desc, v1 asc, v2 asc) pairs per group. The score is a LONG
  * (integer-quantized similarity), so ordering is bit-stable across
  * engines and partitionings — no float rank ties to adjudicate. With
  * map-side partials the shuffle carries <= k pairs per group per map
  * task, which is what lets an exact "best cross-corpus matches per
  * group pair" run over a pair enumeration that is quadratic in rows:
  * the pairs are enumerated but never materialized past the partial
  * aggregation buffers. */
final class TopKPairs(k: Int)
    extends Aggregator[PairHit, Seq[PairHit], Seq[PairHit]] {
  require(k > 0, s"TopKPairs needs k > 0, got $k") // fail at plan, not in a task

  private def lt(a: PairHit, b: PairHit): Boolean =
    a.score > b.score ||
      (a.score == b.score && (a.v1 < b.v1 ||
        (a.v1 == b.v1 && a.v2 < b.v2)))

  override def zero: Seq[PairHit] = Seq.empty
  override def reduce(buf: Seq[PairHit], h: PairHit): Seq[PairHit] =
    if (buf.size >= k && !lt(h, buf.last)) buf
    else ((buf :+ h).sortWith(lt)).take(k)
  override def merge(a: Seq[PairHit], b: Seq[PairHit]): Seq[PairHit] =
    (a ++ b).sortWith(lt).take(k)
  override def finish(buf: Seq[PairHit]): Seq[PairHit] = buf
  override def bufferEncoder: Encoder[Seq[PairHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PairHit]]()
  override def outputEncoder: Encoder[Seq[PairHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PairHit]]()
}
