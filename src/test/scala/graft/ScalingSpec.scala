package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[ScalingCore]] — the scaling-exponent audit's fit / flag /
  * staleness logic, Spark-free (BenchSpec's arrangement), plus the
  * registry-consistency check on [[Scaling.allowlist]].
  */
class ScalingSpec extends AnyFunSuite {

  import ScalingCore._

  test("two-point log-log slope: linear reads 1, quadratic reads 2") {
    assert(math.abs(exponent(0.2, 2.0, 10.0) - 1.0) < 1e-9)
    assert(math.abs(exponent(0.1, 10.0, 10.0) - 2.0) < 1e-9)
    // partition-pruned probe: flat across SFs
    assert(math.abs(exponent(0.3, 0.3, 10.0)) < 1e-9)
  }

  test("overhead-dominated low timings clamp instead of manufacturing exponents") {
    // 0.01 s is pure scheduling floor; raw ratio would read exp 1.3,
    // the clamp reads log(0.2/0.05)/log(10) ≈ 0.6
    val e = exponent(0.01, 0.2, 10.0)
    assert(math.abs(e - math.log(0.2 / FloorSecs) / math.log(10.0)) < 1e-9)
    assert(e < Threshold)
    // a genuine quadratic from a tiny base still clears the threshold:
    // hi-side work ~100× the low side dwarfs the clamp
    assert(exponent(0.02, 1.5, 10.0) > Threshold)
  }

  test("failure sentinels and degenerate ratios never fit") {
    assert(exponent(-1.0, 2.0, 10.0).isNaN)
    assert(exponent(0.5, -1.0, 10.0).isNaN)
    assert(exponent(0.5, 2.0, 1.0).isNaN)
  }

  test("flagged = over threshold and not allowlisted; NaN never flags") {
    val exps = Map("lin" -> 1.0, "quad" -> 1.9, "known_quad" -> 2.1,
      "dead" -> Double.NaN)
    val allow = Map("known_quad" -> "documented eval posture")
    assert(flagged(exps, allow) == Seq("quad"))
    assert(flagged(exps, allow ++ Map("quad" -> "reason")).isEmpty)
  }

  test("allowlist staleness catches both directions") {
    val exps = Map("a" -> 2.0, "b" -> 0.9)
    val allow = Map(
      "a" -> "still quadratic", // measured over threshold: not stale
      "b" -> "was quadratic, got fixed", // below threshold: stale
      "gone" -> "query was removed") // not in the registry: stale
    assert(staleAllow(exps, allow) == Seq("b", "gone"))
  }

  test("every allowlist entry names a registered query and a reason") {
    val names = SparkEntry.queries.keySet
    val unknown = Scaling.allowlist.keySet -- names
    assert(unknown.isEmpty, s"allowlist names unknown queries: $unknown")
    assert(Scaling.allowlist.values.forall(_.trim.length > 20),
      "every allowlist entry must carry a substantive reason")
  }
}
