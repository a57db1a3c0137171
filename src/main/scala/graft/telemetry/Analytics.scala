package graft.telemetry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dashboard analytics — reference parity with streamlit_app.py's KPI,
  * rollup, anomaly, incident, comparison and geo panels, as lazily-composed
  * Catalyst plans instead of eager pandas (SURVEY §3.2: steps 2-6 are one
  * pipeline).
  *
  * Scale posture: every scalar threshold is a tiny aggregate (collect of a
  * 1-row frame), every baseline join is a ≤24-row broadcast, top-k is
  * orderBy+limit (TakeOrderedAndProject), and the scoped scan can be
  * `.persist()`ed by callers that fan out to several panels (SURVEY §4.1
  * caching note).
  */
object Analytics {

  import TelemetrySchema.{zScore, zBad}

  /** A10/P4: the data-contract audit — null counts on key columns, range
    * validations (lat/lon, pred_prob), row count (sa:39-105).
    */
  def dataContract(df: DataFrame): DataFrame = {
    val hasProb = df.columns.contains("pred_prob")
    val probCol: Column =
      if (hasProb) sum((col("pred_prob") < 0 || col("pred_prob") > 1).cast("long"))
      else lit(0L)
    // coalesce(…, 0): a range predicate over an all-null column sums to null,
    // but the contract reports a *count* — zero violations, not unknown.
    def cnt(c: Column): Column = coalesce(sum(c.cast("long")), lit(0L))
    df.agg(
      count(lit(1)).as("n_rows"),
      cnt(isnull(col("timestamp"))).as("null_timestamp"),
      cnt(isnull(col("cell_id"))).as("null_cell_id"),
      cnt(isnull(col("latency_ms"))).as("null_latency"),
      cnt(isnull(col("throughput_mbps"))).as("null_throughput"),
      cnt(isnull(col("drop_rate"))).as("null_drop_rate"),
      cnt(col("lat") < -90 || col("lat") > 90).as("bad_lat"),
      cnt(col("lon") < -180 || col("lon") > 180).as("bad_lon"),
      coalesce(probCol, lit(0L)).as("bad_pred_prob"))
  }

  /** A1/A2: the KPI card scalars — avg throughput, avg drop rate, exact P95
    * latency, NPS proxy (sa:257-303). One aggregate job, collected by the
    * caller.
    */
  def kpis(df: DataFrame): DataFrame = {
    // coalesce(…, false): the reference's pandas comparisons treat NaN as
    // False over ALL rows; a bare avg(pred) would drop null-metric rows from
    // the denominator and diverge on data with nulls.
    val prom = coalesce(
      col("throughput_mbps") >= 150 && col("latency_ms") <= 50 && col("drop_rate") <= 1.0,
      lit(false))
    val det = coalesce(
      col("throughput_mbps") < 100 || col("latency_ms") > 80 || col("drop_rate") > 2.0,
      lit(false))
    df.agg(
      avg("throughput_mbps").as("avg_throughput"),
      avg("drop_rate").as("avg_drop_rate"),
      expr("percentile(latency_ms, 0.95)").as("p95_latency"),
      (avg(prom.cast("double")) * 100 - avg(det.cast("double")) * 100).as("nps_proxy"))
  }

  /** A3 + W1: hourly rollup of a metric with the centered moving average
    * (pandas rolling(win, center=True, min_periods=1)); frame bounds are
    * asymmetric for even windows: floor((w−1)/2) before, floor(w/2) after
    * (SURVEY §7.5.1).
    */
  def hourlyRollup(df: DataFrame, metric: String, maWindow: Int = 3): DataFrame = {
    val hourly = df.groupBy("hour").agg(avg(metric).as("value"))
    val before = (maWindow - 1) / 2
    val after = maWindow / 2
    val w = Window.orderBy("hour").rowsBetween(-before, after)
    hourly.withColumn("smoothed", avg("value").over(w)).orderBy("hour")
  }

  /** P5/A11: risk flag at a quantile threshold. hi-bad metrics flag
    * value ≥ P(q); lo-bad (throughput) flag value ≤ P(1−q) (sa:342-350).
    * The threshold is a 1-row aggregate collected to the driver — the
    * reference-faithful shape, and a single scalar at any scale.
    */
  def riskFlag(df: DataFrame, metric: String, q: Double = 0.95): DataFrame = {
    val hiBad = metric != "throughput_mbps"
    val p = if (hiBad) q else 1 - q
    val thrRow = df.agg(expr(s"percentile($metric, $p)")).first()
    require(!thrRow.isNullAt(0),
      s"riskFlag: percentile($metric, $p) is null — empty frame or all-null metric")
    val thr = thrRow.getDouble(0)
    val flag = if (hiBad) col(metric) >= thr else col(metric) <= thr
    df.withColumn("risk_threshold", lit(thr)).withColumn("at_risk", flag)
  }

  /** A4 + J2 + F8/F9: hour-of-day baseline z-scores for a metric; the
    * baseline is a ≤24-row broadcast join (sa:536-548).
    */
  def anomalyZ(df: DataFrame, metric: String): DataFrame = {
    val base = df.groupBy("hour")
      .agg(avg(metric).as("b_mean"), stddev_samp(col(metric)).as("b_std"))
    df.join(broadcast(base), Seq("hour"), "left")
      .withColumn("z", zScore(col(metric), col("b_mean"), col("b_std")))
      .withColumn("z_bad", zBad(metric, col("z")))
  }

  /** A8 + T3: top-N anomalous cells by worst signed z (sa:544-549). */
  def topAnomalies(df: DataFrame, metric: String, n: Int = 10): DataFrame =
    anomalyZ(df, metric)
      .groupBy("cell_id")
      .agg(max("z_bad").as("max_anom_z"))
      .orderBy(desc("max_anom_z"), col("cell_id"))
      .limit(n)

  /** A5-A7 + T2: per-cell hotspots — exact P95 latency / mean metric,
    * top 10 (sa:499-512).
    */
  def hotspots(df: DataFrame, metric: String = "latency_ms", n: Int = 10): DataFrame = {
    val agg = metric match {
      case "latency_ms" => expr("percentile(latency_ms, 0.95)")
      case m            => avg(m)
    }
    val ranked = df.groupBy("cell_id").agg(agg.as("score"))
    val ordered = if (metric == "throughput_mbps")
      ranked.orderBy(col("score"), col("cell_id"))      // lo-bad: worst = lowest
    else ranked.orderBy(desc("score"), col("cell_id"))
    ordered.limit(n)
  }

  /** A5 + P5 + T4: incident list — cell-hour rollup, z vs hour baseline,
    * risky = z_bad ≥ z of the q-th percentile rule, top 50 (sa:579-622).
    */
  def incidents(df: DataFrame, metric: String, zThr: Double = 2.0, n: Int = 50): DataFrame = {
    val cellHour = df
      .withColumn("ts_h", date_trunc("hour", col("timestamp")))
      .groupBy("cell_id", "ts_h")
      .agg(avg(metric).as("value"), hour(first(col("ts_h"))).as("hour"))
    val base = cellHour.groupBy("hour")
      .agg(avg("value").as("b_mean"), stddev_samp(col("value")).as("b_std"))
    cellHour.join(broadcast(base), Seq("hour"), "left")
      .withColumn("z_bad", zBad(metric, zScore(col("value"), col("b_mean"), col("b_std"))))
      .filter(col("z_bad") >= zThr)
      .orderBy(desc("z_bad"), col("cell_id"), col("ts_h"))
      .limit(n)
  }

  /** J1 + U3 + A12: cell-vs-network comparison — network baseline ⟕ cell
    * series on hour, melted long for charting, with delta chips
    * (sa:398-452).
    */
  def cellVsNetwork(df: DataFrame, cellId: String, metric: String): DataFrame = {
    val net = df.groupBy("hour").agg(avg(metric).as("network"))
    val cell = df.filter(col("cell_id") === cellId)
      .groupBy("hour").agg(avg(metric).as("cell"))
    net.join(cell, Seq("hour"), "left")
      .withColumn("delta", col("cell") - col("network"))
      .orderBy("hour")
  }

  /** Long form of [[cellVsNetwork]] (U3 melt/unpivot). */
  def cellVsNetworkLong(df: DataFrame, cellId: String, metric: String): DataFrame =
    cellVsNetwork(df, cellId, metric)
      .unpivot(Array(col("hour")), Array(col("network"), col("cell")), "series", "value")

  /** W5 + J5 + A13 + F10/F15: risk-map frame — latest row per cell, joined
    * to deduped coordinates, min-max sized, color-ramped (sa:957-1045).
    */
  def riskMap(scored: DataFrame, coords: DataFrame): DataFrame = {
    val latest = Window.partitionBy("cell_id").orderBy(col("timestamp").desc)
    val dedupCoords = coords
      .na.drop(Seq("cell_id", "lat", "lon"))
      .dropDuplicates("cell_id")
      .select("cell_id", "lat", "lon")
    val last = scored
      .withColumn("rn", row_number().over(latest))
      .filter(col("rn") === 1)
      .drop("rn")
    val stats = last.agg(min("pred_prob").as("mn"), max("pred_prob").as("mx"))
    last.join(broadcast(dedupCoords), Seq("cell_id"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("size01",
        when(col("mx") === col("mn"), lit(0.5))
          .otherwise((col("pred_prob") - col("mn")) / (col("mx") - col("mn"))))
      .withColumn("color",
        array(lit(255), (lit(170) * (lit(1.0) - col("size01"))).cast("int"), lit(0), lit(185)))
      .drop("mn", "mx")
  }
}
