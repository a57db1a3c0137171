package graft

/** Pure core of the scaling-exponent audit, separated (BenchCore's
  * arrangement) so the fit / flag / staleness logic is unit-testable
  * without a SparkSession.
  *
  * The audit turns "survives 100×" from a plan-shape argument into a
  * measured curve: run every registry query at two scale factors, fit
  * log(t) against log(sf) — the two-point slope IS the empirical
  * scaling exponent — and flag everything growing faster than
  * [[Threshold]] that is not on the documented-superlinear allowlist.
  * Ideal linear scans sit near 1, partition-pruned probes near 0;
  * an accidental quadratic reads ≈ 2 and can no longer hide behind a
  * small-SF total.
  *
  * Low-side clamp: at sf0.01 many queries are OVERHEAD-dominated
  * (job scheduling + planning ≈ [[FloorSecs]]), and a raw ratio over a
  * tiny denominator manufactures exponents from noise. The low timing
  * is clamped to [[FloorSecs]] before the fit — conservative against
  * false flags, while a genuine quadratic still clears the threshold
  * (its high-SF time is ~100× the low-side work, so the clamped ratio
  * stays ≫ 10^1.3 ≈ 20).
  */
object ScalingCore {

  /** Exponent threshold: 10× data growing >10^1.3 ≈ 20× in time. */
  val Threshold = 1.3

  /** Clamp for overhead-dominated low-SF timings (see scaladoc). */
  val FloorSecs = 0.05

  /** Two-point log-log slope; NaN when either timing is a failure
    * sentinel (< 0) — failed queries are reported, never fitted.
    */
  def exponent(tLo: Double, tHi: Double, sfRatio: Double): Double =
    if (tLo < 0 || tHi < 0 || sfRatio <= 1.0) Double.NaN
    else math.log(math.max(tHi, FloorSecs) / math.max(tLo, FloorSecs)) /
      math.log(sfRatio)

  /** Names over the threshold and NOT allowlisted — the audit's alarm
    * list (sorted; NaN exponents never flag).
    */
  def flagged(exps: Map[String, Double],
              allow: Map[String, String]): Seq[String] =
    exps.collect {
      case (n, e) if e > Threshold && !allow.contains(n) => n
    }.toSeq.sorted

  /** Allowlist staleness, both directions (the BenchSpec discipline —
    * an allowlist that outlives its reason is how audits rot):
    * entries naming a query that no longer exists, and entries whose
    * measured exponent no longer exceeds the threshold (the documented
    * quadratic got fixed — drop the entry so a regression re-flags).
    */
  def staleAllow(exps: Map[String, Double],
                 allow: Map[String, String]): Seq[String] =
    allow.keys.filter(n =>
      !exps.contains(n) || !(exps(n) > Threshold)).toSeq.sorted
}

/** Scaling-audit main: times every registry query at sf0.01 and sf0.1
  * (warm-up pass per SF, then min-of-2), writes the full per-query
  * record to `SCALING.json` and prints a one-line summary. Driver-style
  * env knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY, GRAFT_BENCH_DIR.
  */
object Scaling {

  /** Documented-superlinear queries: each entry names WHY the growth is
    * the operator's point, not an accident. Staleness-checked against
    * the measurements every run (and by ScalingSpec against this map's
    * shape), so an entry cannot outlive its reason silently.
    */
  val allowlist: Map[String, String] = Map.empty
  // Round-11 measurement emptied the list: across all 227 registry
  // queries the largest exponent was 0.92 (e35, whose exact all-pairs
  // kernel is genuinely O(n²) but still sits under per-job overhead +
  // constant factors at sf0.1 — 5.1 s vs 0.6 s is 8×, not 20×). The
  // staleness check caught every speculative entry, which is the
  // discipline working: a name joins this map ONLY when a measurement
  // puts it over the threshold WITH a documented reason, so the first
  // query whose superlinear term outgrows its constants flags loudly
  // instead of hiding behind a pre-excused label.

  def main(args: Array[String]): Unit = {
    val loDir = sys.env.getOrElse("SPARK_GRAFT_SF_LO", "/root/testdata/sf0.01")
    val hiDir = sys.env.getOrElse("SPARK_GRAFT_SF_HI", "/root/testdata/sf0.1")
    val sfRatio = 10.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-scaling", cpus)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, dir).count() } catch { case _: Throwable => return -1.0 }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    // per-SF pass: warm-up then min-of-2 (the bench's steady-state
    // discipline; one fewer rep — the audit wants the EXPONENT, which a
    // 2-rep min pins well within the 20× flag margin)
    def pass(dir: String): Map[String, Double] = {
      queries.foreach { case (_, fn) => run(fn, dir) }
      queries.map { case (n, fn) =>
        n -> math.min(run(fn, dir), run(fn, dir))
      }.toMap
    }
    val lo = pass(loDir)
    val hi = pass(hiDir)
    val exps = queries.map { case (n, _) =>
      n -> ScalingCore.exponent(lo(n), hi(n), sfRatio)
    }.toMap
    val flagged = ScalingCore.flagged(exps, allowlist)
    val stale = ScalingCore.staleAllow(exps, allowlist)

    def jq(s: String) = "\"" + s + "\""
    def jd(d: Double) = if (d.isNaN) "null" else f"$d%.3f"
    val rows = queries.map { case (n, _) =>
      s"${jq(n)}:{" +
        s""""lo":${f"${lo(n)}%.3f"},"hi":${f"${hi(n)}%.3f"},""" +
        s""""exp":${jd(exps(n))}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"sf_lo":${jq(loDir)},"sf_hi":${jq(hiDir)},""" +
      s""""threshold":${ScalingCore.Threshold},""" +
      s""""floor_clamp":${ScalingCore.FloorSecs},""" +
      s""""flagged":${flagged.map(jq).mkString("[", ",", "]")},""" +
      s""""allowlisted":${allowlist.keys.toSeq.sorted.map(jq).mkString("[", ",", "]")},""" +
      s""""stale_allow":${stale.map(jq).mkString("[", ",", "]")},""" +
      s""""queries":$rows}"""
    val outPath = java.nio.file.Paths
      .get(sys.env.getOrElse("GRAFT_BENCH_DIR", "."))
      .resolve("SCALING.json")
    java.nio.file.Files.write(outPath, (json + "\n").getBytes("UTF-8"))

    // human summary: every exponent, sorted descending, with the verdict
    exps.toSeq.sortBy(-_._2).foreach { case (n, e) =>
      val tag =
        if (e.isNaN) "FAILED"
        else if (e > ScalingCore.Threshold && allowlist.contains(n)) "allow"
        else if (e > ScalingCore.Threshold) "FLAG"
        else "ok"
      println(f"# $n%-40s lo=${lo(n)}%7.3f hi=${hi(n)}%7.3f exp=${if (e.isNaN) Double.NaN else e}%5.2f  $tag")
    }
    println(s"""{"metric":"scaling_flagged","value":${flagged.size},"stale_allow":${stale.size},"n_queries":${queries.size}}""")
    spark.stop()
  }
}
