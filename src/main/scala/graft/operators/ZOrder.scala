package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping — a 100 TB
  * layout technique, not a query operator: interleave the bits of several
  * normalized sort keys into one long, then range-partition + sort files
  * by it. Files then carry TIGHT parquet min/max footer stats on EVERY
  * participating column (not just the leading sort key), so predicates on
  * any of them prune files/row-groups at scan time.
  *
  * All pure column expressions (codegen'd shifts/masks) — no UDF, no
  * custom writer. Bounds for normalization are either supplied (cheap,
  * from table stats) or computed with one tiny min/max aggregate.
  */
object ZOrder {

  /** Normalize `c` over [lo, hi] to an integer rank in [0, 2^bits). */
  private def rank(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = when(hi === lo, lit(1.0)).otherwise(hi.cast("double") - lo.cast("double"))
    val maxRank = (1L << bits) - 1 // Long literal: an Int shift would overflow at bits >= 31
    least(
      greatest(((c.cast("double") - lo.cast("double")) / span * maxRank)
        .cast("long"), lit(0L)),
      lit(maxRank))
  }

  /** Morton key: interleave `bits` bits of each ranked column (column j
    * contributes bit i to output position i*n + j — round-robin, so all
    * columns share precision in the high bits).
    */
  def zkey(ranked: Seq[Column], bits: Int): Column = {
    val n = ranked.size
    // Java shifts wrap mod 64, so an over-wide key would silently alias
    // high bits onto low positions — fail loudly instead.
    require(n * bits <= 63,
      s"z-key needs $n×$bits = ${n * bits} bits; max 63 — lower `bits` or cluster fewer columns")
    val terms = for {
      i <- 0 until bits
      (r, j) <- ranked.zipWithIndex
    } yield shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order `df` by `cols` (numeric), normalizing each over its observed
    * min/max (one scalar aggregate, broadcast back — the only non-local
    * step besides the final range exchange). `files` bounds the output
    * file count; at cluster scale pass the target file size's row count
    * instead.
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 16, files: Int = 8): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"${c}__lo"), max(col(c)).as(s"${c}__hi")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val ranked = cols.map(c => rank(col(c), col(s"${c}__lo"), col(s"${c}__hi"), bits))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zkey(ranked, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop(cols.map(c => s"${c}__lo") ++ cols.map(c => s"${c}__hi") ++ Seq("__z"): _*)
  }

  /** Write `df` z-ordered by `cols` as parquet. */
  def writeClustered(df: DataFrame, cols: Seq[String], out: String,
                     bits: Int = 16, files: Int = 8): Unit =
    cluster(df, cols, bits, files).write.mode("overwrite").parquet(out)
}
