package graft.telemetry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch ingest: CSV → cleanse → derive → hive-partitioned Parquet.
  * Reference parity with /root/reference/src/ingest/spark_ingest.py:6-22
  * (S1/S5, P1/P2) — the one part of the reference that was already Spark.
  *
  * Scale notes: `repartition(date, cell_id)` hash-shuffles once so each
  * dynamic partition directory is written by a single task (no
  * many-small-files explosion); at 100 TB add `sortWithinPartitions
  * (timestamp)` for row-group clustering (SURVEY §4.1) — done here since
  * it's free at any scale.
  */
object Ingest {

  /** S1: typed CSV scan with the declared schema (header, no inference). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(TelemetrySchema.schema)
      .csv(path)

  /** P1+P2: cleansing filter and derived partition columns. */
  def cleanse(df: DataFrame): DataFrame =
    df.filter(col("latency_ms") > 0 && col("throughput_mbps") >= 0)
      .withColumn("date", to_date(col("timestamp")))
      .withColumn("hour", hour(col("timestamp")))

  /** S5: partitioned parquet sink (overwrite). */
  def writeCurated(df: DataFrame, out: String): Unit =
    df.repartition(col("date"), col("cell_id"))
      .sortWithinPartitions(col("timestamp"))
      .write.mode("overwrite")
      .partitionBy("date", "cell_id")
      .parquet(out)

  /** S2: curated scan — hive partition discovery is built in; filters on
    * `date`/`cell_id` prune partitions (P3).
    */
  def readCurated(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** End-to-end ingest job (the reference CLI's body). */
  def run(spark: SparkSession, input: String, output: String): Unit =
    writeCurated(cleanse(readCsv(spark, input)), output)
}
