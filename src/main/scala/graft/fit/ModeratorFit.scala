package graft.fit

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The moderator-performance monitor-peak pipeline (F7,
  * `warehouses/.../moderator_performance/fit_monitor.py:89-175` +
  * `moderator_performance.py:43-94`): per run — histogram bin edges ->
  * centers, counts normalized by proton charge (runs < 1.0 uA skipped),
  * fit window mask, gaussian+flat-background LM fit, parameters + errors
  * from the covariance. HDF5 reading is replaced by the declared fixture
  * schema (FIXTURES.md §6); the per-run fit distributes as a
  * `Dataset.map`. */
object ModeratorFit {

  /** Input row: FIXTURES.md §6 (HDF5 layout reduced to columns). */
  final case class RunHistogram(
      run_number: Long, beamline: String, cycle_name: String,
      run_start: java.sql.Timestamp, proton_charge: Double,
      time_of_flight: Array[Double], // N+1 bin edges
      counts: Array[Double]) // N

  /** Output row: the `monitor_peaks` landing schema (FIXTURES.md §5). */
  final case class MonitorPeak(
      beamline: String, run_number: Long, cycle_name: String,
      run_start: java.sql.Timestamp, proton_charge: Double,
      peak_centre: Double, peak_centre_error: Double,
      peak_amplitude: Double, peak_amplitude_error: Double,
      peak_sigma: Double, peak_sigma_error: Double)

  // Fit configuration from `moderator_performance.py:43-60`.
  val FitWindowLow = 3800.0
  val FitWindowHigh = 6850.0
  val FlatBackground = 16.6099
  val P0: Array[Double] = Array(19.2327, 4843.8, 1532.64) // amplitude, mu, sigma
  val Lower: Array[Double] = Array(0.0, 4600.0, 1100.0)
  val Upper: Array[Double] = Array(Double.MaxValue, 5200.0, 1900.0)
  val MinProtonCharge = 1.0 // runs below are skipped (`fit_monitor.py:139-141`)

  def fitRun(run: RunHistogram): Option[MonitorPeak] = {
    if (run.proton_charge < MinProtonCharge) return None
    // bin edges -> centers; counts -> frequencies per uA
    val centers = Array.tabulate(run.counts.length)(i =>
      (run.time_of_flight(i) + run.time_of_flight(i + 1)) / 2.0)
    val freqs = run.counts.map(_ / run.proton_charge)
    val mask = centers.indices.filter(i =>
      centers(i) >= FitWindowLow && centers(i) <= FitWindowHigh)
    if (mask.size < 4) return None
    val xs = mask.map(centers).toArray
    val ys = mask.map(freqs).toArray
    val r = GaussNewton.fit(xs, ys, P0, Lower, Upper,
      GaussNewton.gaussianFlatBg(FlatBackground))
    Some(MonitorPeak(run.beamline, run.run_number, run.cycle_name,
      run.run_start, run.proton_charge,
      peak_centre = r.params(1), peak_centre_error = r.errors(1),
      peak_amplitude = r.params(0), peak_amplitude_error = r.errors(0),
      peak_sigma = r.params(2), peak_sigma_error = r.errors(2)))
  }

  /** Distributed fit: one task per partition of runs. */
  def fitRuns(spark: SparkSession, runs: Dataset[RunHistogram]): DataFrame = {
    import spark.implicits._
    runs.flatMap(fitRun _).toDF()
  }
}
