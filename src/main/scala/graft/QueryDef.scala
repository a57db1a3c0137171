package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two sides; all
  * floating-point outputs are rounded identically on both sides so the
  * driver's value-hash compare is stable across engines.
  *
  * Queries with no SQL-expressible oracle (e.g. MinHash signatures that
  * depend on Spark's xxhash64) leave `oracle` as None → the driver records a
  * weaker rows-only check.
  *
  * == Cross-engine float determinism policy ==
  * Two engines summing the same doubles in different orders differ in the
  * last ulps, and naive `round(x, k)` flips at true decimal .…5 boundaries
  * (Spark rounds the shortest decimal repr via BigDecimal HALF_UP; DuckDB
  * rounds the scaled binary). Every query therefore follows these rules:
  *  1. `round(sum(data), k)` where k is the data's true decimal scale —
  *     an EXACT restore of the decimal sum, never a tie.
  *  2. Averages = that exact sum / exact count, with NO outer rounding:
  *     identical input bits + identical op order → identical output bits.
  *  3. Integer-valued sums (counts, int columns) are exact in doubles —
  *     divide directly, never round.
  *  4. Row-level arithmetic on raw columns (a-b, a*(1-b)) is bit-identical
  *     everywhere — emit unrounded.
  *  5. Sliding/rolling means are spelled as explicit lag/lead expressions,
  *     not frame aggregates (frame add/remove error is engine-specific).
  *  6. Only irrational-valued outputs (stddev, sqrt, percentile
  *     interpolation, z-scores) carry display rounding — their true values
  *     are never exactly on a rounding boundary.
  *  7. Sorts carry full deterministic tie-breaker keys; timestamps are
  *     emitted as epoch-µs longs or DATEs.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
