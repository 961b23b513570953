package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the bench gate arithmetic — the adjudication rules the committed
  * artifacts are read against. These are pure functions/constants, but a
  * silent change to any of them re-labels breaches across every future
  * artifact, so the semantics deserve a spec as much as an operator does. */
class BenchGateSpec extends AnyFunSuite {

  test("budgetCeil applies the overhead floor only where 1.5x is tighter than +0.5s") {
    // b >= 1.5: the pure budget dominates (b/1.5 + 0.5 <= b exactly at 1.5)
    assert(Bench.budgetCeil(1.5) === 1.5)
    assert(Bench.budgetCeil(3.0) === 3.0)
    // sub-1.5 budgets get the absolute pad over the implied median b/1.5:
    // b = 0.6 seeds a 0.4 median -> ceiling 0.9, not 0.6
    assert(math.abs(Bench.budgetCeil(0.6) - 0.9) < 1e-9)
    // the floor never LOWERS a ceiling
    val bs = Seq(0.1, 0.4, 0.8, 1.2, 1.5, 2.0, 10.0)
    bs.foreach(b => assert(Bench.budgetCeil(b) >= b))
    // monotone in the seeded budget
    bs.sliding(2).foreach { case Seq(a, b) =>
      assert(Bench.budgetCeil(a) <= Bench.budgetCeil(b))
    }
  }

  test("gate constants keep their documented relations") {
    // The linear-step bound is the 10x data growth times the same 15%
    // single-run band the calibration dead band uses — a step ratio under
    // it is at most linear, above it genuinely superlinear.
    assert(Bench.LinearStepTolerance === 10.0 * Bench.CalibrationDeadBand)
    // The sf1 floor must sit BELOW the sf10 floor: a wall that is overhead
    // at 10x data is certainly overhead at 100x.
    assert(Bench.Sf1RatioFloorSec < Bench.ScaleProbeFloorSec)
    // The overhead pad must stay small against the smallest real budget
    // class it guards (sub-second rows), or it would mask real regressions.
    assert(Bench.BudgetOverheadFloorSec <= 0.5)
  }

  test("ratioVerdict: precedence, the regressed guard, and the r13 " +
       "committed population replay") {
    def v(scale3: Boolean, cleared: Boolean, wall: Option[Double],
          r: Double, ceil: Option[Double]) =
      Bench.ratioVerdict(scale3, cleared, wall, r, ceil)
    // precedence: cleared beats everything, floor beats linear
    assert(v(true, true, Some(1.0), 99.0, Some(1.5)) === "cleared")
    assert(v(true, false, Some(5.0), 3.5, Some(100.0)) === "floor")
    // sf1 (non-scale3) mode: no linear/regressed resolution exists —
    // an uncleared above-floor breach is confirmed
    assert(v(false, false, Some(50.0), 9.0, Some(3.0)) === "confirmed")
    // the r13 adjudicated-linear population (census-verified honest
    // amortization exhaustion) must replay as "linear" under the
    // regressed guard: d02 (ceiling 6.1, step2 9.19), d15 (3.5, 9.53 —
    // the widest spread at 2.73x its ceiling), d31 (3.5, 8.62),
    // e20 (3.3, 4.69)
    for ((c, r) <- Seq(6.1 -> 9.19, 3.5 -> 9.53, 3.5 -> 8.62, 3.3 -> 4.69))
      assert(v(true, false, Some(60.0), r, Some(c)) === "linear",
        s"r13 honest row (ceiling $c, step $r) must stay linear")
    // ADVICE r13's regression scenario: a row committed at ~2x/step
    // (ceiling 3.0) that steps 9.5-11x must NOT auto-clear as linear
    assert(v(true, false, Some(60.0), 9.5, Some(3.0)) === "regressed")
    assert(v(true, false, Some(60.0), 11.0, Some(3.0)) === "regressed")
    // above the linear tolerance: genuinely superlinear
    assert(v(true, false, Some(60.0), 12.0, Some(3.0)) === "confirmed")
    // no committed ceiling (new row): tolerance alone decides linear
    assert(v(true, false, Some(60.0), 9.0, None) === "linear")
    // NEAR-FLOOR ceilings are overhead-dominated and say nothing about
    // the asymptote: a row re-seeded at 1.6 (e18's r14 post-pin ceiling,
    // measured sf1 ratio 1.06 — pure overhead) whose sf1->sf10 step
    // honestly reaches 8-10x as overhead amortizes must stay "linear",
    // not be flagged 3x over a meaningless ceiling
    assert(v(true, false, Some(60.0), 8.0, Some(1.6)) === "linear")
    assert(v(true, false, Some(60.0), 10.0, Some(2.0)) === "linear")
    // the guard arms exactly at the data-dominated boundary (ceiling 3.0
    // = measured step 2.0 under the 1.5x seed rule)
    assert(v(true, false, Some(60.0), 10.0, Some(2.9)) === "linear")
    assert(v(true, false, Some(60.0), 10.0, Some(3.0)) === "regressed")
  }

  test("io_noise: the spill-wall rule downgrades only census-matched " +
       "spill-heavy rows, and the r14 d15 adjudication replays") {
    def v(r: Double, ceil: Option[Double], spill: Double, shuffle: Double,
          census: Option[(Double, Double)]) =
      Bench.ratioVerdict(true, false, Some(120.0), r, ceil, spill, shuffle, census)
    // The r14 record: d15's sf10 step2 adjudicated 16.02 (> the 11.5
    // tolerance -> would-be confirmed) while shuffle was byte-identical
    // to the committed census (8568.69 vs 8568.69) and spill inside its
    // band (174763 <= 174763 * 1.5) — the three same-code isolated
    // re-runs walking 123.8 -> 304.9s proved the wall was the disk, not
    // the engine. Mechanized verdict: io_noise.
    assert(v(16.02, Some(6.7), 174763.16, 8568.69,
      Some((8568.69, 174763.16))) === "io_noise")
    // A LOST PUSHDOWN (shuffle balloons past the +20% band) is never
    // excused, no matter how much it spills.
    assert(v(16.02, Some(6.7), 174763.16, 17000.0,
      Some((8568.69, 174763.16))) === "confirmed")
    // A sort-pressure explosion (spill past +50% of census) is a real
    // regression signal, not I/O noise.
    assert(v(16.02, Some(6.7), 300000.0, 8568.69,
      Some((8568.69, 174763.16))) === "confirmed")
    // LESS work than census strengthens the excuse (the late-r14 band-hash
    // change reduces these rows' bytes — one-sided bands absorb it).
    assert(v(16.02, Some(6.7), 90000.0, 4000.0,
      Some((8568.69, 174763.16))) === "io_noise")
    // A spill-light row's wall is a compute measurement: verdict stands.
    assert(v(16.02, Some(6.7), 0.0, 10269.35,
      Some((10269.35, 0.0))) === "confirmed")
    // No committed census (new row): never downgrades.
    assert(v(16.02, Some(6.7), 174763.16, 8568.69, None) === "confirmed")
    // A would-be "regressed" spill-heavy census-matched row downgrades too
    // (the wall is unbelievable in either direction)...
    assert(v(10.0, Some(3.0), 174763.16, 8568.69,
      Some((8568.69, 174763.16))) === "io_noise")
    // ...but linear/floor/cleared rows never reach the io_noise branch.
    assert(v(9.0, Some(6.7), 174763.16, 8568.69,
      Some((8568.69, 174763.16))) === "linear")
    assert(Bench.ratioVerdict(true, false, Some(5.0), 16.02, Some(6.7),
      174763.16, 8568.69, Some((8568.69, 174763.16))) === "floor")
    assert(Bench.ratioVerdict(true, true, Some(120.0), 16.02, Some(6.7),
      174763.16, 8568.69, Some((8568.69, 174763.16))) === "cleared")
    // Non-scale3 (sf1) mode: the rule is sf10-tier only — sf1 rows are
    // spill-light by construction and their gate has its own floor.
    assert(Bench.ratioVerdict(false, false, Some(120.0), 16.02, Some(6.7),
      174763.16, 8568.69, Some((8568.69, 174763.16))) === "confirmed")
    // Census entries exist only for rows that are actually benched, and
    // the spill threshold sits above every committed spill-LIGHT row's
    // volume (the heaviest non-census row spilled 0 at sf10).
    Bench.sf10WorkCensusMb.keys.foreach(n =>
      assert(Bench.headline.contains(n), s"$n censused but not benched"))
    assert(Bench.SpillWallMb >= 50000.0)
  }

  test("sf1MaxRatio ceilings are well-formed and cover only benched rows") {
    val benched = Bench.headline.toSet
    Bench.sf1MaxRatio.foreach { case (name, ceil) =>
      assert(benched.contains(name), s"$name gated but not benched")
      assert(ceil >= 1.5, s"$name ceiling $ceil below the 1.5 floor")
    }
    // Guard against DROPPING ceilings, without blocking the documented
    // new-row lag (a bench row added mid-round has no measured ratio until
    // the next sf1 pass, so it legitimately gates a round late): the map
    // may trail the headline by new rows but must never shrink below the
    // r13 re-seed's full 117-row coverage.
    assert(Bench.sf1MaxRatio.size >= 117)
    assert(Bench.sf1MaxRatio.size <= Bench.headline.size)
  }

  test("every headline row resolves to a runnable query") {
    val all = SparkEntry.queries.keySet ++ Bench.benchOnlyQueries.keySet
    val missing = Bench.headline.filterNot(all.contains)
    assert(missing.isEmpty, s"headline rows without a query: $missing")
  }

  test("every budgeted row is benched") {
    val benched = Bench.headline.toSet
    val orphaned = Bench.budgets.keySet.filterNot(benched.contains)
    assert(orphaned.isEmpty, s"budgeted but never benched: $orphaned")
  }
}
