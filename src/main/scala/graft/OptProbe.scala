package graft

/** Optimization-round measurement harness (guide §1): for each named
  * registry query, print the wall time of the computation through the
  * NOOP sink (every column of every row computed, output discarded —
  * §1.4) and optionally dump `.explain("formatted")` to a file per
  * query for the committed plan evidence (`plans/r*\/<name>_{before,
  * after}.txt`).
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.OptProbe <sfDir> <reps> \
  *     <name1,name2,...> [planDir] [suffix]"
  *
  * Not part of the driver contract — Bench remains the timing of
  * record (count() action, min-of-3, floor probes); this probe exists
  * for A/B work where the committed bench methodology is too heavy.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(',').toSeq
    val planDir = if (args.length > 3) Some(args(3)) else None
    val suffix = if (args.length > 4) args(4) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-optprobe", cpus)
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      planDir.foreach { d =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val short = n.takeWhile(_ != '_')
        val p = java.nio.file.Paths.get(d, s"$short$suffix.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      }
      spark.sparkContext.setJobDescription(s"optprobe: $n")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      println(f"#OPT $n%-40s min=${times.min}%7.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
