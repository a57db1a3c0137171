package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** Misra-Gries heavy-hitters summary as a typed Spark `Aggregator` — the
  * custom-UDAF surface (SURVEY §2.10 notes the reference needs none; this
  * exists for the 100 TB extension story): top-k frequent tokens with
  * bounded state, NO full groupBy over the token space.
  *
  * Semantics: classic Misra-Gries. Each partial buffer holds at most
  * `capacity` counters; overflow subtracts the minimum counter from all
  * and drops zeros. Buffers merge by counter addition followed by the
  * same compaction (mergeable-summaries property: merged error stays
  * ≤ n/(capacity+1) per key, where n is the total token count). When
  * `capacity` ≥ the number of distinct tokens, no eviction ever fires
  * and the result is EXACT under any merge order — which is what makes
  * the d11 query oracle-checkable at test scale while the same operator
  * degrades gracefully to approximate at corpus scale.
  *
  * Scale posture: state is O(capacity) per partial aggregation, shuffled
  * once to a single reducer (one small map per partition) — contrast a
  * full `groupBy(token)` whose shuffle is O(distinct tokens).
  */
case class TokenCount(token: String, est_count: Long)

class HeavyHittersAgg(k: Int, capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[TokenCount]] {

  require(k <= capacity, "k must be <= capacity")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  private def compact(b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    if (b.size <= capacity) return b
    // subtract the (capacity+1)-th largest count from everything; drop <= 0
    val cut = b.values.toArray.sorted(Ordering.Long.reverse).apply(capacity)
    val out = mutable.HashMap.empty[String, Long]
    b.foreach { case (t, c) => if (c - cut > 0) out(t) = c - cut }
    out
  }

  override def reduce(b: mutable.HashMap[String, Long], token: String): mutable.HashMap[String, Long] = {
    b(token) = b.getOrElse(token, 0L) + 1L
    compact(b)
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (t, c) => big(t) = big.getOrElse(t, 0L) + c }
    compact(big)
  }

  override def finish(b: mutable.HashMap[String, Long]): Seq[TokenCount] =
    b.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .map { case (t, c) => TokenCount(t, c) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[TokenCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
