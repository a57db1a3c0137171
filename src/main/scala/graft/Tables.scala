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

  /** Input-skew guard for heavy scan-fused compute (optimization guide
    * §2.5 "input skew" / §1.2 step 1). The driver testdata ships each
    * table as ONE parquet row group, so every leaf scan is a single
    * task and anything Catalyst fuses into the scan stage — per-shingle
    * hashing, per-row codec roundtrips, per-pair scoring against a
    * broadcast side — runs on one core regardless of `local[n]`. When
    * the frame's scan parallelism is below the session default,
    * redistribute by hash of `key` BEFORE the heavy work; the shuffle
    * carries only the columns projected so far, so callers project to
    * the narrow proxy first (guide §8's decide-small discipline). On a
    * cluster-scale input (many splits) the branch is a no-op — this is
    * a layout fix, not a local[32] tuning constant. Hash (not
    * round-robin) partitioning: deterministic under task retries
    * (SPARK-38388) and exchange-reusable by downstream groupBy/window
    * on the same key.
    */
  def fanOut(df: DataFrame, key: String = "doc_id"): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(key)) else df
  }

  /** [[fanOut]] for a BOUNDED post-cut frame (a broadcast-restricted
    * slice, never data-scaled): unconditional, because probing `.rdd`
    * here would finalize the AQE plan and EXECUTE the upstream stages a
    * second time (measured: d61's broadcast-cut + probe read 3.9→4.8 s
    * — the probe ran the pair subtree once for the partition count and
    * once for the query). The frame is bounded by construction, so the
    * exchange is always cheap relative to the per-row work it spreads —
    * at any scale.
    */
  def spread(df: DataFrame, key: String = "doc_id"): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

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

  /** `events.ts` has shipped in two parquet physical types across driver
    * testdata generations: TIMESTAMP(NANOS) (readable by Spark only as a
    * raw nanosecond Long via the legacy flag) and plain TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ when the file is not UTC-adjusted). Adapt on
    * the RESOLVED schema rather than assuming a generation:
    *  - LongType → nanos: truncate ns→µs with integer division (`div`,
    *    NOT floating `/` — nanos ~1.7e18 exceed double's 2^53 integer
    *    range), matching how DuckDB/pandas truncate.
    *  - TIMESTAMP_NTZ → cast to session-local TimestampType; the session
    *    timezone is pinned UTC ([[GraftSession]]), so the cast is
    *    value-preserving and downstream hour/weekday bucketing matches
    *    the DuckDB oracle exactly.
    * Either way callers see one stable contract: `ts` TimestampType, µs
    * precision, UTC.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
