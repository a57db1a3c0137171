package graft.telemetry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Telemetry data model — reference parity with
  * /root/reference/src/utils/schema.py:3-18 (13 declared columns) plus the
  * alias-tolerant resolution and null-materializing schema repair the
  * dashboard layer performs (streamlit_app.py:41-52, 627-651).
  */
object TelemetrySchema {

  /** Declared ingest schema (S1): enforced at CSV read time. */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("cell_id", StringType, nullable = false),
    StructField("lat", DoubleType, nullable = true),
    StructField("lon", DoubleType, nullable = true),
    StructField("rsrp_dbm", DoubleType, nullable = true),
    StructField("rsrq_db", DoubleType, nullable = true),
    StructField("sinr_db", DoubleType, nullable = true),
    StructField("throughput_mbps", DoubleType, nullable = true),
    StructField("latency_ms", DoubleType, nullable = true),
    StructField("jitter_ms", DoubleType, nullable = true),
    StructField("drop_rate", DoubleType, nullable = true),
    StructField("tech", StringType, nullable = true),
    StructField("band", StringType, nullable = true)))

  val metricCols: Seq[String] = Seq(
    "rsrp_dbm", "rsrq_db", "sinr_db", "throughput_mbps",
    "latency_ms", "jitter_ms", "drop_rate")

  case class Telemetry(
      timestamp: java.sql.Timestamp, cell_id: String,
      lat: Option[Double], lon: Option[Double],
      rsrp_dbm: Option[Double], rsrq_db: Option[Double], sinr_db: Option[Double],
      throughput_mbps: Option[Double], latency_ms: Option[Double],
      jitter_ms: Option[Double], drop_rate: Option[Double],
      tech: Option[String], band: Option[String])

  /** Alias lists for tolerant column resolution (F14; sa:41-52, 768-793).
    * FIRST match in the list wins — ordering is part of the contract
    * (SURVEY §7.5.6).
    */
  val aliases: Map[String, Seq[String]] = Map(
    "cell_id"   -> Seq("cell_id", "cell", "cellid", "id"),
    "timestamp" -> Seq("timestamp", "ts", "datetime", "date_time", "time"),
    "pred_prob" -> Seq("pred_prob", "proba", "score", "y_hat", "prob", "p"),
    "latency_ms" -> Seq("latency_ms", "latency", "rtt_ms"),
    "throughput_mbps" -> Seq("throughput_mbps", "throughput", "thpt_mbps"))

  /** Case-insensitive alias resolution: returns the df with canonical names
    * applied, first-alias-wins, as a pre-analysis rename pass (engine
    * helper, not a Catalyst rule — SURVEY §4.2.1).
    */
  def resolveAliases(df: DataFrame): DataFrame = {
    val lower = df.columns.map(c => c.toLowerCase -> c).toMap
    aliases.foldLeft(df) { case (acc, (canon, cands)) =>
      if (acc.columns.contains(canon)) acc
      else cands.collectFirst { case c if lower.contains(c.toLowerCase) => lower(c.toLowerCase) }
        .map(found => acc.withColumnRenamed(found, canon))
        .getOrElse(acc)
    }
  }

  /** `_ensure_cols` semantics (X5; sa:627-651): required columns that are
    * absent materialize as typed nulls instead of erroring.
    */
  def ensureCols(df: DataFrame, required: Map[String, DataType]): DataFrame =
    required.foldLeft(df) { case (acc, (name, dt)) =>
      if (acc.columns.contains(name)) acc
      else acc.withColumn(name, lit(null).cast(dt))
    }

  /** F8: z-score with the σ==0→1e-9 guard (nulls propagate — SURVEY §7.5.3). */
  def zScore(x: Column, mean: Column, std: Column): Column =
    (x - mean) / when(std === 0, lit(1e-9)).otherwise(std)

  /** F9: sign flip for lo-bad metrics (higher throughput is better). */
  def zBad(metric: String, z: Column): Column =
    if (metric == "throughput_mbps") -z else z
}
