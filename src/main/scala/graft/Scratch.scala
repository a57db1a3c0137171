package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.telemetry._

/** Throwaway probe (deleted before final commit rounds). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // E2E on the reference's own raw CSV (read-only input)
    val out = "/tmp/graft_e2e_curated"
    Ingest.run(spark, "/root/reference/data/raw/sample_cells.csv", out)
    val cur = Ingest.readCurated(spark, out)
    println("CURATED rows=" + cur.count() + " partitions(date)=" +
      cur.select("date").distinct().count() + " cells=" + cur.select("cell_id").distinct().count())
    println("KPIS " + Analytics.kpis(cur).first())
    println("TOP_ANOM " + Analytics.topAnomalies(cur, "latency_ms", 3).collect().mkString(" | "))
    val feats = Scorer.label(Features.build(cur), "latency_ms", 0.8)
    val spec = Scorer.fitSpec(feats, Features.numericFeatures)
    val scored = Scorer.score(feats, spec)
    println("EVAL " + Scorer.evaluate(scored, k = 10))
    val latest = Features.latest(scored.select("cell_id", "ts", "timestamp", "pred_prob"))
    val map = Analytics.riskMap(latest, cur.select("cell_id", "lat", "lon", "timestamp"))
    println("RISKMAP " + map.select("cell_id", "pred_prob", "size01", "color").collect().mkString(" | "))
    val svc = new Summarizer.Service(spark, new Summarizer.StubClient(), Summarizer.Config(), () => 0L)
    println("SUMMARY " + svc.summarize(Map("kpis" -> Analytics.kpis(cur))))
    // PROBE: alias-named dirty frame through resolveAliases + ensureCols + contract
    import spark.implicits._
    val odd = Seq(("2025-07-01 00:00:00", "c1", 999.0)).toDF("TS", "CellId", "Proba")
    val fixed = TelemetrySchema.ensureCols(TelemetrySchema.resolveAliases(odd),
      Map("latency_ms" -> org.apache.spark.sql.types.DoubleType))
    println("ALIAS " + fixed.columns.mkString(",") )
    println("CONTRACT " + Analytics.dataContract(fixed.withColumn("timestamp", to_timestamp($"timestamp"))
      .withColumn("cell_id", $"cell_id").withColumn("lat", lit(null).cast("double"))
      .withColumn("lon", lit(null).cast("double")).withColumn("throughput_mbps", lit(null).cast("double"))
      .withColumn("drop_rate", lit(null).cast("double")).withColumn("pred_prob", $"pred_prob")).first())
    spark.stop()
  }
}
