package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session posture, shared by the Verify/Bench
  * mains and any embedding application. A cluster deployment submits with
  * the same confs (plus `spark.sql.extensions=graft.functions
  * .GraftExtensions` to get the native functions without a code hook).
  *
  * Why these settings:
  *  - `shuffle.partitions` sized to the parallelism at hand — locally the
  *    core count; on a 1000-executor cluster, 2-3× total cores as the
  *    STARTING point, with AQE's partition coalescing (on by default in
  *    Spark 4) shrinking small stages at runtime, so over-provisioning
  *    the static number is cheap while under-provisioning spills.
  *  - `session.timeZone=UTC` pinned: every temporal query (hour buckets,
  *    weekday rollups, week cohorts) must bucket identically regardless
  *    of host timezone — and identically to the DuckDB oracle.
  *  - AQE left at Spark 4 defaults (on): runtime skew-join splitting and
  *    coalescing are part of the engine's skew posture (PlanSpec pins the
  *    behaviors themselves).
  *  - UI off for headless runs (driver harness / CI).
  */
object GraftSession {

  def build(appName: String, master: String, shufflePartitions: Int,
            extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(spark)
    spark
  }

  /** Local session for the driver-harness mains: `local[cpus]` with
    * shuffle partitions = cpus (not the 200 default — 200 tiny partitions
    * on a laptop-scale input is pure scheduling overhead).
    */
  def local(appName: String, cpus: Int): SparkSession =
    build(appName, s"local[$cpus]", cpus)
}
