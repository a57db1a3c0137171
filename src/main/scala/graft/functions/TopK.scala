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
