package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed exact ranking primitives.
  *
  * A global `ntile(k) OVER (ORDER BY score)` is the classic scale trap:
  * Spark's WindowExec with an empty partitionSpec moves EVERY row to one
  * task, so a ranking over a data-scaled dimension (customers, documents)
  * funnels the whole dimension through a single partition at 100 TB. This
  * object provides the exact two-level formulation the repo already uses
  * for prefix sums (d25 sequence packing, q38 rank metrics), generalized
  * to ntile over an arbitrary numeric score — and, unlike a purely static
  * bucketing, ADAPTIVE to the observed distribution:
  *
  *   1. one parallel min/max aggregate fixes the NaN-free score span;
  *   2. each row maps to one of `nBuckets` VALUE bins (monotone in the
  *      sort direction — derived from the score itself, never from
  *      `spark_partition_id`, which is layout-dependent and would make
  *      the result nondeterministic across runs);
  *   3. per-bin counts (≤ `nBuckets` rows) come back to the driver; bins
  *      whose count exceeds `maxBinRows` — the skew hole a static scheme
  *      cannot close, e.g. a 99%-constant score column — are SPLIT:
  *        - exact score values heavier than `maxBinRows` get their own
  *          partition block, sub-divided by a monotone projection of the
  *          first tie column (equal scores order purely by ties, so a
  *          tie-key range is a contiguous rank range);
  *        - the open intervals between heavy values are re-binned over
  *          the bin's own span (finer value bins);
  *        - NaN scores (which Spark sorts greatest) get a reserved block
  *          at the correct end of the bin's order;
  *   4. every final partition is a CONTIGUOUS slice of the global order,
  *      so per-partition counts (collected, bounded by the partition
  *      table size) cumsum into exact global offsets on the driver, and
  *      the only windows in the plan are `row_number` partitioned by the
  *      composite partition id — fully parallel, no partition-less
  *      window anywhere;
  *   5. the exact integer ntile formula converts rank to tile:
  *      with n rows and k tiles, q = n div k and rem = n mod k, the
  *      first rem tiles hold q+1 rows — precisely Spark's and DuckDB's
  *      NTILE semantics, so oracle hashes are unchanged.
  *
  * Determinism: callers must pass tie-breaker columns that make the total
  * order unique (the same requirement the flat window form had). All
  * driver decisions derive from deterministic aggregates of the data
  * (spans, counts, heavy values), never from physical layout or
  * sampling, so repeated runs partition — and rank — identically.
  *
  * NaN policy: NaN scores are routed to the position Spark's own sort
  * gives them (greatest — last under ascending, first under descending),
  * so results stay bit-equal to the flat `ntile` window. Null scores
  * remain outside the contract (callers must pre-filter or coalesce).
  *
  * Cost: the input subtree is evaluated three times (span, bin counts,
  * final rank); a skewed bin adds the split round — the heavy-value
  * scan, ONE batched quantile-boundary aggregate covering every heavy
  * value at once (a per-value loop would serialize one driver job per
  * heavy value), and the split partition count. Every pass is fully
  * parallel; callers with an expensive upstream persist it first
  * (Caching.withPersisted or the runner-owned registry contract).
  *
  * Residual limitation (documented, two refinement levels): an
  * oversized bin splits into value intervals / heavy-value key bins,
  * and a split partition that is STILL over `maxBinRows` (values
  * clustered again inside one sub-interval) re-bins once more over its
  * own observed span. What remains unbounded after both levels is a
  * partition with a DEGENERATE span: a heavy exact value whose tie
  * keys are themselves constant (a non-total order, outside the
  * contract) or project to one point. For adversarial low-entropy
  * scores an approximate histogram-sketch quantile (t19) is the
  * documented escape hatch.
  */
object Ranking {

  /** Working column names; inputs must not collide (guarded). */
  private val Reserved =
    Set("__part", "__boff", "__r", "__b", "__s", "__k", "__dv")

  /** Clamped value-bin of `v` over [a, b] into `m` bins (driver bounds). */
  private def subBin(v: Column, a: Double, b: Double, m: Int): Column =
    if (!(b - a > 0.0)) lit(0L)
    else least(lit(m - 1L), greatest(lit(0L),
      floor((v - lit(a)) / lit(b - a) * m).cast("long")))

  /** Monotone numeric projection of a tie column, used only to SUB-BIN a
    * heavy equal-score group (balance matters; strict order does not —
    * the in-partition window still sorts by the real columns, so a
    * non-strict monotone projection is sufficient).
    *
    * Strings: the longest common prefix of the group's min/max key is
    * stripped on the driver (doc_00001-style keys would otherwise all
    * project to one value), then the next 6 UTF-8 bytes read as a
    * base-16 integer — monotone in Spark's binary string ordering, and
    * 48 bits stays exact in the double. Numerics cast to double
    * (long→double rounding is monotone); temporal types go through
    * epoch seconds. Returns None for unsupported types (single sub-bin
    * degradation — still correct, just not subdivided).
    */
  private def keyProj(c: Column, dt: DataType, minRaw: Any,
                      maxRaw: Any): Option[Column] = dt match {
    case StringType =>
      val ab = Option(minRaw).map(_.toString).getOrElse("").getBytes("UTF-8")
      val bb = Option(maxRaw).map(_.toString).getOrElse("").getBytes("UTF-8")
      var lcp = 0
      while (lcp < ab.length && lcp < bb.length && ab(lcp) == bb(lcp)) lcp += 1
      Some(conv(
        rpad(hex(substring(c.cast("binary"), lcp + 1, 6)), 12, "0"), 16, 10)
        .cast("double"))
    case _: NumericType => Some(c.cast("double"))
    case BooleanType => Some(c.cast("int").cast("double"))
    case DateType => Some(c.cast("timestamp").cast("double"))
    case TimestampType => Some(c.cast("double"))
    case _ => None
  }

  /** Bin by explicit ascending boundaries (quantiles of the projected
    * key): k ≤ b₁ → 0, k ≤ b₂ → 1, …, else |bounds|. Contiguous and
    * monotone by construction; duplicate boundaries just leave empty
    * bins. Quantile boundaries — unlike linear interpolation over
    * min/max — stay balanced when keys cluster (decimal-digit string
    * suffixes use 10 of 256 values per byte, so a linear split would
    * crowd most rows into a few bins).
    */
  private def boundedBin(k: Column, bounds: Seq[Double]): Column =
    bounds.distinct.zipWithIndex.reverse
      .foldLeft(lit(bounds.distinct.length.toLong)) { case (acc, (b, i)) =>
        when(k <= lit(b), lit(i.toLong)).otherwise(acc)
      }

  /** Adds an exact global NTILE column named `out` to `df`, equivalent to
    * `ntile(nTiles) OVER (ORDER BY score [DESC], ties...)` but with no
    * partition-less window over `df` itself.
    *
    * @param df         input frame; `score` must be non-null (NaN is
    *                   allowed and sorts like Spark sorts it: greatest)
    * @param nTiles     number of tiles (e.g. 10 for deciles)
    * @param score      numeric ranking column (cast to double for binning
    *                   only — bin assignment just has to be monotone, the
    *                   in-bin ordering uses the original column)
    * @param ascending  sort direction for rank 1
    * @param ties       extra ORDER BY columns making the order total
    *                   (at least one; the first is also the sub-bin key
    *                   for heavy equal-score groups)
    * @param out        name of the produced tile column (IntegerType,
    *                   matching Spark's `ntile`)
    * @param nBuckets   number of value bins; bounds the driver-collected
    *                   count frame at `nBuckets` rows
    * @param maxBinRows skew threshold: a bin (or exact value) heavier
    *                   than this triggers the split round
    */
  def exactNtile(df: DataFrame, nTiles: Int, score: Column,
                 ascending: Boolean, ties: Seq[Column], out: String,
                 nBuckets: Int = 1024,
                 maxBinRows: Long = 1L << 23): DataFrame =
    exactNtileParts(df, nTiles, score, ascending, ties, out, nBuckets,
      maxBinRows).drop("__part")

  /** [[exactNtile]] with the internal `__part` partition id retained —
    * the test hook that lets specs assert every window partition stayed
    * under the bound.
    */
  private[graft] def exactNtileParts(df: DataFrame, nTiles: Int,
      score: Column, ascending: Boolean, ties: Seq[Column], out: String,
      nBuckets: Int = 1024, maxBinRows: Long = 1L << 23): DataFrame = {
    require(nTiles > 0, s"nTiles must be positive, got $nTiles")
    require(nBuckets > 0 && nBuckets <= (1 << 20),
      s"nBuckets out of range: $nBuckets")
    require(maxBinRows > 0, s"maxBinRows must be positive, got $maxBinRows")
    require(ties.nonEmpty,
      "exactNtile needs at least one tie column to make the order total")
    val clash = df.columns.toSet.intersect(Reserved)
    require(clash.isEmpty,
      s"input columns collide with exactNtile working names: $clash")

    val spark = df.sparkSession
    import spark.implicits._

    val d = score.cast("double")
    val dv = when(isnan(d), lit(null)).otherwise(d) // NaN-free view for spans

    // -- pass 1: global NaN-free span (one parallel aggregate, 1 row)
    val spanRow = df.agg(min(dv), max(dv)).head()
    val lo = if (spanRow.isNullAt(0)) 0.0 else spanRow.getDouble(0)
    val hi = if (spanRow.isNullAt(1)) 0.0 else spanRow.getDouble(1)
    val width = hi - lo

    // Value-bin id, monotone in the sort direction: bin 0 holds the rows
    // that rank first. NaN sorts greatest in Spark, so it lands in the
    // last bin ascending / first bin descending; a degenerate span
    // (all-equal scores) collapses to bin 0 and the split round below
    // takes over if the bin is oversized.
    val nanBin = if (ascending) (nBuckets - 1).toLong else 0L
    val frac = if (ascending) (d - lit(lo)) / lit(width)
               else (lit(hi) - d) / lit(width)
    val bin: Column =
      if (width > 0.0)
        when(isnan(d), lit(nanBin)).otherwise(
          least(lit(nBuckets - 1L),
            greatest(lit(0L), floor(frac * nBuckets).cast("long"))))
      else when(isnan(d), lit(nanBin)).otherwise(lit(0L))

    // -- pass 2: per-bin count + NaN-free bin span (≤ nBuckets rows)
    val binStats = df.select(bin.as("__b"), dv.as("__dv"))
      .groupBy("__b")
      .agg(count(lit(1)).as("cnt"), min("__dv").as("blo"), max("__dv").as("bhi"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1)
    val n = binStats.map(_._2).sum
    val oversized = binStats.filter(_._2 > maxBinRows)

    // u-space: negate for descending so within-bin order is always u-asc
    // (NaN is handled by explicit branches — -NaN is still NaN).
    val u: Column = if (ascending) d else -d
    def toU(v: Double): Double = if (ascending) v else -v

    val nSub = nBuckets // fan-out for interval re-bins and key bins alike

    // -- skew round (only when some bin exceeded maxBinRows)
    val (partExpr: Column, partCounts: Seq[(Long, Long)]) =
      if (oversized.isEmpty) {
        (col("__b"), binStats.map(s => (s._1, s._2)).toSeq)
      } else {
        val tieDt = df.select(ties.head).schema.head.dataType
        val oBins = oversized.map(_._1).toSet

        // Heavy exact values per oversized bin: deterministic aggregate
        // (groupBy normalizes NaN and -0.0); result bounded at
        // Σ_b cnt_b / maxBinRows rows. The RAW tie-key min/max feed the
        // per-group key-bin projection (prefix stripping needs the real
        // strings, not a pre-projected number).
        val heavy = df.filter(bin.isin(oBins.toSeq: _*))
          .select(bin.as("__b"), d.as("__s"), ties.head.as("__k"))
          .groupBy("__b", "__s")
          .agg(count(lit(1)).as("c"), min("__k").as("klo"), max("__k").as("khi"))
          .filter(col("c") > maxBinRows)
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.get(3), r.get(4)))
          .groupBy(_._1)

        // Key-bin boundaries for ALL heavy equal-score groups in ONE
        // aggregate (skew path only): each group's tie key goes through
        // its own monotone projection (string groups strip different
        // common prefixes, so the projected key is a per-group CASE
        // chain), then a single groupBy(__b, __s) computes every
        // group's quantile boundaries together. A per-value driver loop
        // here would serialize one tiny job per heavy value — bounded
        // (heavy values ≤ Σcnt/maxBinRows) but pathological on a column
        // with hundreds of heavy values. Boundaries affect only
        // partition BALANCE, never the ranks, so the approximation is
        // safe; determinism per run is what matters, and both consumers
        // of the expression (the count pass and the rank pass) share
        // the same collected literals.
        val kSub = math.min(nBuckets, 256)
        val qPoints = (1 until kSub).map(_.toDouble / kSub).toArray
        val heavyGroups = heavy.values.flatten.toSeq
        def sBits(v: Double): Long = java.lang.Double.doubleToLongBits(v)
        val boundsByGroup: Map[(Long, Long), Seq[Double]] =
          if (heavyGroups.isEmpty ||
              keyProj(ties.head, tieDt, null, null).isEmpty) Map.empty
          else {
            def groupPred(b: Long, sVal: Double): Column =
              col("__b") === b &&
                (if (sVal.isNaN) isnan(col("__s")) else col("__s") === lit(sVal))
            val anyHeavy = heavyGroups
              .map { case (b, sVal, _, _) => groupPred(b, sVal) }
              .reduce(_ || _)
            val kp = heavyGroups.foldLeft(lit(null).cast("double")) {
              case (acc, (b, sVal, klo, khi)) =>
                keyProj(col("__k"), tieDt, klo, khi)
                  .map(k => when(groupPred(b, sVal), k).otherwise(acc))
                  .getOrElse(acc)
            }
            df.select(bin.as("__b"), d.as("__s"), ties.head.as("__k"))
              .filter(anyHeavy)
              .select(col("__b"), col("__s"), kp.as("__kp"))
              .groupBy("__b", "__s")
              .agg(percentile_approx(col("__kp"), lit(qPoints), lit(10000))
                .as("qs"))
              .collect()
              .map { r =>
                val bounds =
                  if (r.isNullAt(2)) Seq.empty[Double]
                  else r.getSeq[Any](2)
                    .collect { case x: java.lang.Number => x.doubleValue() }
                    .toSeq
                ((r.getLong(0), sBits(r.getDouble(1))), bounds)
              }.toMap
          }
        def keyBinFor(b: Long, sVal: Double, minRaw: Any, maxRaw: Any): Column =
          keyProj(ties.head, tieDt, minRaw, maxRaw) match {
            case None => lit(0L)
            case Some(kcol) =>
              val bounds =
                boundsByGroup.getOrElse((b, sBits(sVal)), Seq.empty)
              if (bounds.isEmpty) lit(0L) else boundedBin(kcol, bounds)
          }

        // Per oversized bin, an ordinal expression whose partitions tile
        // the bin's order contiguously. Ordinal layout (u-ascending):
        //   [NaN key-bins when descending]
        //   interval_0 value-bins, heavy_1 key-bins, interval_1, ...,
        //   heavy_m key-bins, interval_m
        //   [NaN key-bins when ascending]
        // All branch bounds are driver literals — a flat chain of whens.
        case class OBin(b: Long, ord: Column, nOrd: Long)
        val obs = oversized.map { case (b, _, bloOpt, bhiOpt) =>
          val hvAll = heavy.getOrElse(b, Array.empty[(Long, Double, Any, Any)])
          val hv = hvAll.filterNot(_._2.isNaN)
            .map(t => (t._2, toU(t._2), t._3, t._4)).sortBy(_._2).toSeq
          val nanHv = hvAll.find(_._2.isNaN)
          // u-space bounds of the bin's non-NaN values (negation swaps
          // the endpoints under descending; min/max restores order)
          val uA = bloOpt.map(toU).getOrElse(0.0)
          val uB = bhiOpt.map(toU).getOrElse(0.0)
          val (a0, bEnd) = (math.min(uA, uB), math.max(uA, uB))
          val bounds = a0 +: hv.map(_._2) :+ bEnd

          var c = 0L
          var nanOrd = 0L
          if (!ascending) { nanOrd = c; c += kSub } // NaN ranks first desc
          val ivOrds = new Array[Long](hv.length + 1)
          val hvOrds = new Array[Long](hv.length)
          for (j <- 0 to hv.length) {
            ivOrds(j) = c; c += nSub
            if (j < hv.length) { hvOrds(j) = c; c += kSub }
          }
          if (ascending) { nanOrd = c; c += kSub } // NaN ranks last asc

          // interval chain: u < v_1 → interval 0, u < v_2 → interval 1,
          // ..., otherwise the last interval (covers u up to the bin max)
          val lastIv = lit(ivOrds(hv.length)) +
            subBin(u, bounds(hv.length), bounds(hv.length + 1), nSub)
          val ivChain = hv.indices.reverse.foldLeft(lastIv) { (acc, j) =>
            when(u < lit(hv(j)._2),
              lit(ivOrds(j)) + subBin(u, bounds(j), bounds(j + 1), nSub))
              .otherwise(acc)
          }
          // exact-value branches take precedence over interval ranges;
          // the NaN branch precedes everything (NaN fails every < / ===)
          val withHv = hv.indices.reverse.foldLeft(ivChain) { (acc, j) =>
            when(u === lit(hv(j)._2),
              lit(hvOrds(j)) + keyBinFor(b, hv(j)._1, hv(j)._3, hv(j)._4))
              .otherwise(acc)
          }
          val nanKbExpr = nanHv
            .map(t => keyBinFor(b, Double.NaN, t._3, t._4))
            .getOrElse(lit(0L))
          val ordExpr = when(isnan(d), lit(nanOrd) + nanKbExpr)
            .otherwise(withHv)
          OBin(b, ordExpr, c)
        }

        val mult = math.max(1L, obs.map(_.nOrd).max)
        val pExpr = obs.foldLeft(col("__b") * lit(mult)) { (acc, ob) =>
          when(col("__b") === ob.b, lit(ob.b * mult) + ob.ord).otherwise(acc)
        }

        // -- extra pass: exact counts per split partition (oversized
        // bins only; bounded by the driver-built partition table)
        val oCounts = df.withColumn("__b", bin)
          .filter(col("__b").isin(oBins.toSeq: _*))
          .select(pExpr.as("__part")).groupBy("__part").count()
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(oCounts.map(_._2).sum == oversized.map(_._2).sum,
          "exactNtile internal error: split partitions lost rows")
        val normal = binStats.filterNot(s => oBins(s._1))
          .map(s => (s._1 * mult, s._2))

        // -- second refinement level: a split partition can STILL exceed
        // maxBinRows when the bin's values cluster AGAIN inside one
        // sub-interval (double-cluster skew: 1e-12-scale noise under a
        // 1e-6-scale bin). Each such partition re-bins over its OWN
        // observed u-span — monotone within the partition, so every
        // final partition remains a contiguous slice of the global
        // order and the driver cumsum stays exact. Partition ids scale
        // uniformly by nSub (refined get their sub-bin, the rest sub 0)
        // so relative order is untouched. Degenerate spans — a heavy
        // exact value whose tie keys could not be subdivided, or
        // all-NaN — keep one sub-bin: the residual documented above
        // (a non-total order is outside the contract).
        val still = oCounts.filter(_._2 > maxBinRows).map(_._1)
        if (still.isEmpty) (pExpr, (normal ++ oCounts).toSeq)
        else {
          val uNN = when(isnan(d), lit(null).cast("double")).otherwise(u)
          val spans = df.withColumn("__b", bin)
            .filter(col("__b").isin(oBins.toSeq: _*))
            .select(pExpr.as("__part"), uNN.as("__dv"))
            .filter(col("__part").isin(still.toSeq: _*))
            .groupBy("__part")
            .agg(min("__dv").as("lo"), max("__dv").as("hi"))
            .collect().map(r => (r.getLong(0),
              (if (r.isNullAt(1)) 0.0 else r.getDouble(1),
               if (r.isNullAt(2)) 0.0 else r.getDouble(2)))).toMap
          val p2 = still.foldLeft(pExpr * lit(nSub.toLong)) { (acc, p) =>
            val (a, b2) = spans(p)
            when(pExpr === lit(p), lit(p * nSub) + subBin(u, a, b2, nSub))
              .otherwise(acc)
          }
          val oCounts2 = df.withColumn("__b", bin)
            .filter(col("__b").isin(oBins.toSeq: _*))
            .select(p2.as("__part")).groupBy("__part").count()
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          require(oCounts2.map(_._2).sum == oversized.map(_._2).sum,
            "exactNtile internal error: refined partitions lost rows")
          (p2, (normal.map { case (p, c) => (p * nSub, c) } ++ oCounts2).toSeq)
        }
      }

    // Driver-side exact offsets: every partition is a contiguous rank
    // range and partition ids order exactly like (bin, ordinal), so one
    // cumsum over the collected counts yields each partition's global
    // 0-based rank offset. Broadcast back as a tiny literal frame.
    val sortedParts = partCounts.sortBy(_._1)
    val offs = sortedParts.scanLeft(0L)(_ + _._2).zip(sortedParts)
      .map { case (off, (p, _)) => (p, off) }
      .toDF("__part", "__boff")

    // -- final pass: parallel in-partition row_number + broadcast offsets
    val order = (if (ascending) score.asc else score.desc) +: ties.map(_.asc)
    val w = Window.partitionBy("__part").orderBy(order: _*)
    val ranked = df.withColumn("__b", bin)
      .withColumn("__part", partExpr).drop("__b")
      .join(broadcast(offs), "__part")
      .withColumn("__r", col("__boff") + row_number().over(w))

    // Exact NTILE with DRIVER-literal totals: q = n div k, rem = n mod k;
    // ranks 1..rem·(q+1) fall in the first rem (larger) tiles, the rest
    // in size-q tiles. All integer arithmetic — bit-identical to the
    // engines' own NTILE. q == 0 (n < k) emits the rank directly (each
    // row its own tile), keeping the div-by-q branch out of the plan
    // entirely (ANSI-safe).
    val q = n / nTiles; val rem = n % nTiles
    val tile: Column =
      if (q == 0L) col("__r")
      else expr(
        s"""CASE WHEN __r <= ${rem * (q + 1)}
           |     THEN (__r + $q) div ${q + 1}
           |     ELSE $rem + (__r - ${rem * (q + 1)} + ${q - 1}) div $q
           |END""".stripMargin)
    ranked.withColumn(out, tile.cast("int")).drop("__boff", "__r")
  }
}
