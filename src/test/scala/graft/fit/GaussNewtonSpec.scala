package graft.fit

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** F7: LM fit recovers known gaussian parameters; the moderator pipeline
  * normalizes, masks, skips low-charge runs (`fit_monitor.py:72-175`). */
class GaussNewtonSpec extends AnyFunSuite with SparkSpec {

  private def gaussian(a: Double, mu: Double, sigma: Double, bg: Double)(x: Double) = {
    val d = (x - mu) / sigma
    a * math.exp(-0.5 * d * d) + bg
  }

  test("fit recovers known parameters from a clean gaussian") {
    val (a, mu, sigma) = (20.0, 4900.0, 1400.0)
    val xs = Array.tabulate(100)(i => 3800.0 + i * 30.0)
    val ys = xs.map(gaussian(a, mu, sigma, ModeratorFit.FlatBackground))
    val r = GaussNewton.fit(xs, ys, ModeratorFit.P0, ModeratorFit.Lower,
      ModeratorFit.Upper, GaussNewton.gaussianFlatBg(ModeratorFit.FlatBackground))
    assert(math.abs(r.params(0) - a) < 0.01, s"amplitude ${r.params(0)}")
    assert(math.abs(r.params(1) - mu) < 1.0, s"centre ${r.params(1)}")
    assert(math.abs(r.params(2) - sigma) < 1.0, s"sigma ${r.params(2)}")
    assert(r.errors.forall(e => !e.isNaN && e < 1.0)) // near-exact fit
  }

  test("bounds clamp the fit inside the configured window") {
    val xs = Array.tabulate(50)(i => 3800.0 + i * 60.0)
    // true centre outside [4600, 5200]
    val ys = xs.map(gaussian(20.0, 6000.0, 1400.0, ModeratorFit.FlatBackground))
    val r = GaussNewton.fit(xs, ys, ModeratorFit.P0, ModeratorFit.Lower,
      ModeratorFit.Upper, GaussNewton.gaussianFlatBg(ModeratorFit.FlatBackground))
    assert(r.params(1) >= 4600.0 && r.params(1) <= 5200.0)
  }

  test("moderator pipeline: charge normalization, window mask, low-charge skip") {
    import spark.implicits._
    val edges = Array.tabulate(101)(i => 3000.0 + i * 50.0)
    val centers = Array.tabulate(100)(i => (edges(i) + edges(i + 1)) / 2)
    val charge = 2.0
    def counts(a: Double, mu: Double) =
      centers.map(x => gaussian(a, mu, 1400.0, ModeratorFit.FlatBackground)(x) * charge)
    val runs = Seq(
      ModeratorFit.RunHistogram(1L, "beamA", "cycle_24_2",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), charge,
        edges, counts(19.0, 4800.0)),
      // below the 1.0 uA proton-charge threshold -> skipped
      ModeratorFit.RunHistogram(2L, "beamA", "cycle_24_2",
        java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 0.5,
        edges, counts(19.0, 4800.0))).toDS()
    val out = ModeratorFit.fitRuns(spark, runs).collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Long]("run_number") == 1L)
    assert(math.abs(row.getAs[Double]("peak_centre") - 4800.0) < 1.0)
    assert(math.abs(row.getAs[Double]("peak_amplitude") - 19.0) < 0.05)
    assert(row.getAs[Double]("peak_sigma_error") >= 0.0)
  }
}
