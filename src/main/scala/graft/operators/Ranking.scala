package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking primitives.
  *
  * A global `ntile(k) OVER (ORDER BY score)` is the classic scale trap:
  * Spark's WindowExec with an empty partitionSpec moves EVERY row to one
  * task, so a ranking over a data-scaled dimension (customers, documents)
  * funnels the whole dimension through a single partition at 100 TB. This
  * object provides the exact two-level formulation the repo already uses
  * for prefix sums (d25 sequence packing, q38 rank metrics), generalized
  * to ntile over an arbitrary numeric score:
  *
  *   1. one parallel min/max aggregate fixes the score span;
  *   2. each row maps to one of `nBuckets` VALUE bins (monotone in the
  *      sort direction — derived from the score itself, never from
  *      `spark_partition_id`, which is layout-dependent and would make
  *      the result nondeterministic across runs);
  *   3. per-bin counts form a ≤ `nBuckets`-row frame; the only
  *      single-partition window runs THERE (bounded by construction,
  *      recursively bucketable if ever too big), yielding each bin's
  *      global rank offset and the grand total;
  *   4. an in-bin `row_number` (partitioned window — parallel) plus the
  *      broadcast bin offset is the exact global 1-based rank;
  *   5. the exact integer ntile formula converts rank to tile:
  *      with n rows and k tiles, q = n div k and rem = n mod k, the
  *      first rem tiles hold q+1 rows — precisely Spark's and DuckDB's
  *      NTILE semantics, so oracle hashes are unchanged.
  *
  * Determinism: callers must pass tie-breaker columns that make the total
  * order unique (the same requirement the flat window form had); the
  * score must be non-null. The input subtree is evaluated three times
  * (span, bin counts, final rank) — each a fully parallel pass; callers
  * with an expensive upstream persist it first (Caching.withPersisted or
  * the runner-owned registry contract).
  */
object Ranking {

  /** Adds an exact global NTILE column named `out` to `df`, equivalent to
    * `ntile(nTiles) OVER (ORDER BY score [DESC], ties...)` but with no
    * partition-less window over `df` itself.
    *
    * @param df        input frame; `score` must be non-null on every row
    * @param nTiles    number of tiles (e.g. 10 for deciles)
    * @param score     numeric ranking column (cast to double for binning
    *                  only — bin assignment just has to be monotone, the
    *                  in-bin ordering uses the original column)
    * @param ascending sort direction for rank 1
    * @param ties      extra ORDER BY columns making the order total
    * @param out       name of the produced tile column (IntegerType,
    *                  matching Spark's `ntile`)
    * @param nBuckets  number of value bins; bounds the only sequential
    *                  window at `nBuckets` rows
    */
  def exactNtile(df: DataFrame, nTiles: Int, score: Column,
                 ascending: Boolean, ties: Seq[Column], out: String,
                 nBuckets: Int = 1024): DataFrame = {
    require(nTiles > 0, s"nTiles must be positive, got $nTiles")
    val d = score.cast("double")
    val span = df.agg(min(d).as("__lo"), max(d).as("__hi"))
    // Value-bin id, monotone in the sort direction: bin 0 holds the rows
    // that rank first. A degenerate span (all-equal scores) collapses to
    // bin 0 and the tie columns decide the whole order.
    val width = col("__hi") - col("__lo")
    val frac = if (ascending) (d - col("__lo")) / width
               else (col("__hi") - d) / width
    val bin = when(width <= lit(0.0), lit(0L)).otherwise(
      least(lit(nBuckets - 1L),
        greatest(lit(0L), floor(frac * nBuckets).cast("long"))))
    val binned = df.crossJoin(broadcast(span))
      .withColumn("__bin", bin).drop("__lo", "__hi")
    // Bin offsets + grand total over the tiny bin frame — the ONLY
    // unpartitioned windows, bounded at nBuckets rows by construction.
    val counts = binned.groupBy("__bin").agg(count(lit(1)).as("__bcnt"))
    val offs = counts
      .withColumn("__boff", coalesce(sum("__bcnt").over(
        Window.orderBy("__bin")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum("__bcnt").over(
        Window.orderBy("__bin").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("__bin", "__boff", "__n")
    val order = (if (ascending) score.asc else score.desc) +: ties.map(_.asc)
    val inBin = Window.partitionBy("__bin").orderBy(order: _*)
    binned.join(broadcast(offs), "__bin")
      .withColumn("__r", col("__boff") + row_number().over(inBin))
      // Exact NTILE: q = n div k, rem = n mod k; ranks 1..rem·(q+1) fall
      // in the first rem (larger) tiles, the rest in size-q tiles. All
      // integer arithmetic — bit-identical to the engines' own NTILE.
      .withColumn("__q", expr(s"__n div $nTiles"))
      .withColumn("__rem", expr(s"__n % $nTiles"))
      .withColumn(out, expr(
        s"""CASE WHEN __r <= __rem * (__q + 1)
           |     THEN (__r + __q) div (__q + 1)
           |     ELSE __rem + (__r - __rem * (__q + 1) + __q - 1) div __q
           |END""".stripMargin).cast("int"))
      .drop("__bin", "__boff", "__n", "__r", "__q", "__rem")
  }
}
