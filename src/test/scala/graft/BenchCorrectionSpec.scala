package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r19 self-correcting-artifact contract in Bench.
  *
  * Round 18's official bench shipped whole-run contaminated (inflation
  * 1.59x) with the clean isolated reruns demoted to a side map, so the
  * round's perf record was environmental noise. Two behaviors are pinned:
  * the rerun trigger fires for EVERY row past 2x its prior (no top-N cap
  * is expressible here, but the threshold itself is), and the isolated
  * rerun median is promoted to the primary per-query number.
  */
class BenchCorrectionSpec extends AnyFunSuite {

  test("isOutlier: 2x ratio with +1s absolute excess") {
    // past 2x AND more than 1s over the prior -> rerun
    assert(Bench.isOutlier(m = 3.5, p = 1.5))
    // past 2x but sub-second excess (jitter on a fast query) -> no rerun
    assert(!Bench.isOutlier(m = 0.9, p = 0.3))
    // big absolute excess but under 2x (steady load, caught by the
    // whole-run inflation guard instead) -> no rerun
    assert(!Bench.isOutlier(m = 11.0, p = 10.0))
    // exactly 2x is NOT an outlier (strict >)
    assert(!Bench.isOutlier(m = 4.0, p = 2.0))
    // the r18 drift case: 2.81 vs prior 1.71 is under 2x -> inflation
    // guard territory, not a rerun (documents the boundary)
    assert(!Bench.isOutlier(m = 2.81, p = 1.71))
    // the r13 phantom case: 18.4 vs prior 2.25 -> rerun
    assert(Bench.isOutlier(m = 18.4, p = 2.25))
  }

  test("corrected: isolated rerun median becomes primary") {
    assert(Bench.corrected(18.4, Some(2.21)) == 2.21)
    // no rerun -> full-run median stands
    assert(Bench.corrected(1.2, None) == 1.2)
    // a FAILED rerun (sentinel -1.0) must never become the primary number
    assert(Bench.corrected(18.4, Some(-1.0)) == 18.4)
    // a rerun that confirms a real regression stands as-is (no min():
    // taking the smaller would hide genuine drift)
    assert(Bench.corrected(5.0, Some(4.8)) == 4.8)
  }
}
