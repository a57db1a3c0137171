package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k-per-group aggregate — the scale-first alternative
  * to the `row_number() OVER (PARTITION BY …) <= k` window formulation.
  *
  * The window plan shuffles EVERY row of a group to one partition and
  * sorts it; this Aggregator keeps an O(k) buffer per group with map-side
  * partial aggregation, so the shuffle carries at most k (value, id)
  * pairs per group per input partition, and nothing is ever fully sorted.
  * At a 100 TB fact table with bounded k this is the difference between a
  * sort of the table and a linear scan.
  *
  * Determinism: ordering is (value DESC, id ASC) — ties keep the smaller
  * id, independent of partitioning/merge order, which is what makes
  * queries built on it oracle-checkable.
  */
case class Ranked(value: Double, id: Long)

class TopKAgg(k: Int) extends Aggregator[Ranked, Seq[Ranked], Seq[Ranked]] {

  require(k > 0)

  // Buffers stay sorted (value desc, id asc) and bounded at k: insertion
  // keeps the invariant, so reduce/merge are order-insensitive.
  private def insert(b: Seq[Ranked], r: Ranked): Seq[Ranked] =
    (b :+ r).sortBy(x => (-x.value, x.id)).take(k)

  override def zero: Seq[Ranked] = Vector.empty

  override def reduce(b: Seq[Ranked], r: Ranked): Seq[Ranked] =
    if (b.size == k && (r.value < b.last.value ||
        (r.value == b.last.value && r.id > b.last.id))) b
    else insert(b, r)

  override def merge(a: Seq[Ranked], b: Seq[Ranked]): Seq[Ranked] =
    (a ++ b).sortBy(x => (-x.value, x.id)).take(k)

  override def finish(b: Seq[Ranked]): Seq[Ranked] = b

  override def bufferEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Ranked]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Bounded posting-list aggregate: the smallest `bound` ids of the group,
  * ascending, plus the EXACT group count — one pass, O(bound) state,
  * map-side combinable.
  *
  * This is the frequency-capped inverted index in a single aggregation:
  * a consumer that only expands groups with `df <= cap` (using
  * `bound = cap + 1`) reads a COMPLETE sorted posting list for exactly
  * those groups — `df <= cap < bound` means nothing was evicted — while
  * a hot group costs `bound` ids of state instead of its full (possibly
  * corpus-sized) membership. Replaces the two-pass
  * count-then-anti-join-then-collect_list shape: one shuffle of the
  * posting stream instead of two, same boundedness guarantee.
  *
  * Determinism: the kept set ("bound smallest ids") and its order are
  * properties of the group's VALUE SET, independent of partitioning and
  * merge order; df is an exact count. Both engines of an oracle pair
  * therefore agree bit-for-bit.
  */
case class Posting(ds: Seq[Long], df: Long)

class BoundedPostingAgg(bound: Int) extends Aggregator[Long, Posting, Posting] {

  require(bound > 0)

  override def zero: Posting = Posting(Vector.empty, 0L)

  override def reduce(b: Posting, id: Long): Posting = {
    val ds =
      if (b.ds.length == bound && id >= b.ds.last) b.ds
      else ((b.ds :+ id).sorted: Seq[Long]).take(bound)
    Posting(ds, b.df + 1)
  }

  override def merge(a: Posting, b: Posting): Posting =
    Posting(((a.ds ++ b.ds).sorted: Seq[Long]).take(bound), a.df + b.df)

  override def finish(b: Posting): Posting = b

  override def bufferEncoder: Encoder[Posting] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Posting] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
