package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) —
  * the deterministic, oracle-checkable alternative to HLL
  * (`approx_count_distinct` seeds per-plan, so its output can never be
  * hash-compared against another engine).
  *
  * State is the k smallest DISTINCT hash values seen, kept sorted
  * ascending and bounded at k — O(k) per group, map-side partial
  * aggregation, merge = set-union + re-take(k). Mergeability is the
  * scale property: per-partition / per-group / per-day sketches combine
  * by value-set union WITHOUT revisiting raw data, so a 100 TB distinct
  * count is one linear scan plus k-long exchanges. The estimator
  * ((k-1)·M / h_k for a hash space of size M) and its exact-below-k
  * branch live in the query layer (Temporal t22), spelled identically
  * in the DuckDB oracle.
  *
  * Buffers hold exact `Long` hashes: h_k must round-trip bit-identically
  * with the oracle's BIGINT sort — a Double buffer would round 60-bit
  * hashes at 2^53 and (in principle) flip the estimate's last ulp.
  *
  * Beyond the reference (no sketches exist there — its distinct counts
  * are pandas `nunique` at 600 rows, streamlit_app.py:371,990); SURVEY §2.4
  * A9's scale row. Determinism: insertion order and partitioning never
  * change the result, because the buffer invariant (sorted, distinct,
  * ≤ k) is restored after every reduce/merge.
  */
object Kmv {
  /** md5_long60's hash space: 2⁶⁰. */
  val HashSpace: Double = 1152921504606846976.0

  /** The (k−1)·M/h_k estimator with the exact-below-k branch — shared by
    * the batch query (t22) and the streaming sketch so the two spellings
    * cannot drift (a mis-sized M or a dropped −1 silently shifts every
    * estimate; SemanticsSpec pins the bound against this one definition).
    */
  def estimate(mins: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(size(mins) < k, size(mins).cast("long"))
      .otherwise(round(lit((k - 1) * HashSpace) / element_at(mins, k)).cast("long"))
  }
}

class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {

  require(k > 0)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], h: Long): Seq[Long] =
    if (b.size == k && h >= b.last) b // bounded: reject above the cut
    else if (b.contains(h)) b         // set semantics: k DISTINCT minima
    else (b :+ h).sorted.take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
