package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (see /root/repo/TESTDATA.md and
  * /root/repo/FIXTURES.md §B). One parquet file per table under the given
  * scale-factor directory.
  *
  * Scale notes: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so callers should NOT pre-materialize or
  * cache here. At cluster scale the same loaders work unchanged; partition
  * sizing is governed by `spark.sql.files.maxPartitionBytes`.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** All table names served by this loader. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so a SQL-first user can
    * drive the engine through `spark.sql(...)` alone — the same frames the
    * Scala API serves (events keeps its ns→µs normalization).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach {
      case "events" => events(spark, dir).createOrReplaceTempView("events")
      case n        => table(spark, dir, n).createOrReplaceTempView(n)
    }

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark reads
    * only as a raw nanosecond Long (legacy flag). We truncate to microseconds
    * with integer division (`div`, NOT floating `/` — nanos ~1.7e18 exceed
    * double's 2^53 integer range) which matches how DuckDB/pandas truncate
    * ns→µs, so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
