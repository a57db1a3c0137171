package graft.telemetry

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature builder for next-hour scoring — reference parity with
  * `_build_latest_features` (streamlit_app.py:667-715, X2): per-cell
  * rolling mean/std/diff over 3 hours for each metric, hour-of-day baseline
  * z, calendar features, filtered to the latest hour. Pure Window
  * expressions — the reference's row-preserving "UDTF" needs no UDF in
  * Spark (SURVEY §2.10 X2).
  *
  * Scale: all windows partition by cell_id (parallel across cells); the
  * final latest-hour filter compares against a broadcast 1-row max.
  */
object Features {

  import TelemetrySchema.{metricCols, zScore, zBad}

  /** Full feature frame: one row per (cell, hour-floor ts) with 37 numeric
    * features (7 metrics × {raw, _rmean, _rstd, _rdiff} + z_bad/b_mean/b_std
    * + hour/dow/is_weekend) and the `tech`/`band` categoricals.
    */
  def build(df: DataFrame, labelMetric: String = "latency_ms"): DataFrame = {
    val hourly = df
      .withColumn("ts", date_trunc("hour", col("timestamp")))
      .withColumn("hour", hour(col("ts")))
    val byCell = Window.partitionBy("cell_id").orderBy("ts")
    val trail3 = byCell.rowsBetween(-2, 0)

    val rolled = metricCols.foldLeft(hourly) { (acc, m) =>
      acc
        .withColumn(s"${m}_rmean", avg(m).over(trail3))
        .withColumn(s"${m}_rstd", coalesce(stddev_samp(col(m)).over(trail3), lit(0.0)))
        .withColumn(s"${m}_rdiff", coalesce(col(m) - lag(m, 1).over(byCell), lit(0.0)))
    }

    val base = hourly.groupBy("hour")
      .agg(avg(labelMetric).as("b_mean"), stddev_samp(col(labelMetric)).as("b_std"))

    rolled
      .join(broadcast(base), Seq("hour"), "left")
      .withColumn("z_bad",
        zBad(labelMetric, zScore(col(labelMetric), col("b_mean"), col("b_std"))))
      .withColumn("dow", weekday(col("ts")))
      .withColumn("is_weekend", (weekday(col("ts")) >= 5).cast("int"))
  }

  /** Latest-hour snapshot of the feature frame (P8): one row per cell. */
  def latest(features: DataFrame): DataFrame = {
    val mx = features.agg(max("ts").as("max_ts"))
    features.crossJoin(broadcast(mx))
      .filter(col("ts") === col("max_ts"))
      .drop("max_ts")
  }

  /** The 37 numeric feature names the scorer standardizes (bundle parity:
    * FIXTURES.md §A scored-output fixture).
    */
  val numericFeatures: Seq[String] =
    metricCols ++
    metricCols.flatMap(m => Seq(s"${m}_rmean", s"${m}_rstd", s"${m}_rdiff")) ++
    Seq("z_bad", "b_mean", "b_std", "hour", "dow", "is_weekend")

  val categoricalFeatures: Seq[String] = Seq("tech", "band")
}
