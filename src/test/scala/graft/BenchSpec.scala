package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchCore]] — the bench's noise adjudication, replayed against a
  * synthetic degraded window (no SparkSession needed). The scenario is
  * round 9's real artifact: a contiguous block of queries inflated 2-4×
  * by host contention that the pre/post floor probes both missed. The
  * core must FLAG exactly the inflated-in-window queries and must NOT
  * flag a genuine regression that happened on a healthy floor.
  */
class BenchSpec extends AnyFunSuite {

  import BenchCore._

  // 4 segments of floors: healthy, healthy, DEGRADED (0.45 s), healthy.
  // floors(i) brackets segment i on the left; floors(i+1) on the right.
  private val floors = IndexedSeq(0.06, 0.07, 0.45, 0.42, 0.06)

  private val priors = Map(
    "a1" -> 1.0, "a2" -> 2.0, // segment 0 (healthy)
    "b1" -> 1.0, "b2" -> 0.5, // segment 1 (right bracket degraded)
    "c1" -> 1.0, "c2" -> 3.0, // segment 2 (fully degraded window)
    "d1" -> 1.0 // segment 3 (left bracket degraded)
  )

  test("localFloor is the worse of the two bracketing probes") {
    assert(localFloor(Timing("a1", 1.0, 0), floors) == 0.07)
    assert(localFloor(Timing("b1", 1.0, 1), floors) == 0.45)
    assert(localFloor(Timing("c1", 1.0, 2), floors) == 0.45)
    assert(localFloor(Timing("d1", 1.0, 3), floors) == 0.42)
    // last segment clamps to the final (post) probe, no out-of-bounds
    assert(localFloor(Timing("z", 1.0, 4), IndexedSeq(0.1, 0.2, 0.3, 0.4, 0.5)) == 0.5)
  }

  test("degraded needs BOTH 3x-the-best-probe and the absolute grace") {
    assert(!degraded(0.08, 0.06), "a healthy window is not degraded")
    assert(degraded(0.45, 0.06), "7.5x the best probe is degraded")
    // 3x a tiny best floor is still under the 0.15 s grace: not degraded
    assert(!degraded(0.10, 0.03))
    // a big local floor is degraded even against a mediocre best
    assert(degraded(0.50, 0.12))
  }

  test("degraded-window replay: inflated-in-window queries are flagged, nothing else") {
    val timings = Seq(
      Timing("a1", 1.05, 0), // healthy window, near prior
      Timing("a2", 7.0, 0), // healthy window, 3.5x prior — GENUINE regression
      Timing("b1", 3.4, 1), // degraded right bracket, 3.4x prior — suspect
      Timing("b2", 0.9, 1), // degraded bracket but under 3x prior — honest
      Timing("c1", 4.2, 2), // degraded window, 4.2x prior — suspect
      Timing("c2", 2.8, 2), // degraded window, under 3x prior — honest
      Timing("d1", 16.8, 3), // degraded left bracket, 16.8x — suspect (the d39 case)
      Timing("nEw", 9.9, 2), // no prior — never second-guessed
      Timing("c3", -1.0, 2) // failed sentinel — never re-run
    )
    assert(suspects(timings, floors, priors) == Seq("b1", "c1", "d1"))
  }

  test("an all-healthy floor series flags nothing, even far over prior") {
    val healthy = IndexedSeq(0.06, 0.07, 0.06, 0.08, 0.06)
    val timings = Seq(Timing("a1", 9.0, 1), Timing("c2", 30.0, 2))
    assert(suspects(timings, healthy, priors).isEmpty,
      "slow on a healthy floor is a real regression, not noise")
  }

  test("parsePriors reads the committed bench_queries.json line shape") {
    val line = """{"metric":"total","value":123.456,"n_failed":0,""" +
      """"failed":[],"queries":{"q01":0.523,"d39":4.961,"e35":-1.0},""" +
      """"pipeline":[6.1,19.2,63.6],"floor":[0.074,0.085],"sf":"/x/sf0.1"}"""
    val p = parsePriors(line)
    assert(p == Map("q01" -> 0.523, "d39" -> 4.961, "e35" -> -1.0))
    // the values outside the queries object must NOT leak in
    assert(!p.contains("pipeline") && !p.contains("floor"))
    // garbled / absent input degrades to no priors, never throws
    assert(parsePriors("").isEmpty)
    assert(parsePriors("{\"metric\":\"total\"}").isEmpty)
    assert(parsePriors("{\"queries\":oops}").isEmpty)
  }
}
