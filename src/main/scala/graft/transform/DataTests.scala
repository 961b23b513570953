package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt schema/data tests (§5.4): `not_null`, `unique`, `accepted_values`
  * generate a query returning the VIOLATING rows — a test passes when the
  * result is empty (`cycles.yml:5-19`, `incident_monitor_peaks.yml:5-17`,
  * `base_opralogweb__entries.yml:5-8`).
  */
object DataTests {

  final case class TestResult(model: String, test: String, violations: Long) {
    def passed: Boolean = violations == 0
  }

  def notNull(df: DataFrame, column: String): DataFrame =
    df.where(col(column).isNull)

  def unique(df: DataFrame, columns: Seq[String]): DataFrame =
    df.groupBy(columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)

  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.where(col(column).isNotNull &&
      !col(column).isin(values.map(v => v: Any): _*))

  /** Run a suite of named tests over a built model map; each entry returns
    * its violating-row count. */
  def run(models: Map[String, DataFrame],
          tests: Seq[(String, String, DataFrame => DataFrame)]): Seq[TestResult] =
    tests.map { case (model, name, t) =>
      TestResult(model, name, t(models(model)).count())
    }

  /** The reference's declared data tests for the accelerator models
    * (`cycles.yml:5-19`, `stg_opralogweb__mcr_equipment_downtime.yml`,
    * `mcr_equipment_downtime_records.yml`). */
  def acceleratorSuite: Seq[(String, String, DataFrame => DataFrame)] = Seq(
    ("cycles", "not_null:name", notNull(_, "name")),
    ("cycles", "unique:name", unique(_, Seq("name"))),
    ("cycles", "not_null:started_at", notNull(_, "started_at")),
    ("cycles", "not_null:ended_at", notNull(_, "ended_at")),
    ("cycles", "accepted_values:phase",
      acceptedValues(_, "phase", Seq("run-up", "user-time", "machine-physics"))),
    ("stg_opralogweb__mcr_equipment_downtime", "not_null:equipment",
      notNull(_, "equipment")),
    ("mcr_equipment_downtime_records", "not_null:fault_occurred_at",
      notNull(_, "fault_occurred_at")))

  /** Beamlines tests (`incident_monitor_peaks.yml:5-17`,
    * `stg_moderator_performance__monitor_peaks.yml:5-35`). */
  def beamlinesSuite: Seq[(String, String, DataFrame => DataFrame)] = {
    val stgCols = Seq("beamline", "run_number", "run_start", "proton_charge",
      "peak_centre", "peak_centre_error", "peak_amplitude",
      "peak_amplitude_error", "peak_sigma", "peak_sigma_error")
    stgCols.map(c => ("stg_moderator_performance__monitor_peaks",
      s"not_null:$c", notNull(_: DataFrame, c))) ++ Seq(
      ("incident_monitor_peaks", "not_null:beamline",
        notNull(_: DataFrame, "beamline")),
      ("incident_monitor_peaks", "not_null:run_start",
        notNull(_: DataFrame, "run_start")),
      ("incident_monitor_peaks", "not_null:peak_centre",
        notNull(_: DataFrame, "peak_centre")))
  }

  /** Estates tests (`power_consumption.yml:5-10`,
    * `stg_electricity_sharepoint_rdm_data.yml:5-10`). */
  def estatesSuite: Seq[(String, String, DataFrame => DataFrame)] = Seq(
    ("stg_electricity_sharepoint_rdm_data", "not_null:power_measured_at",
      notNull(_, "power_measured_at")),
    ("stg_electricity_sharepoint_rdm_data", "not_null:total_isis_power_mw",
      notNull(_, "total_isis_power_mw")),
    ("power_consumption", "not_null:power_measured_at",
      notNull(_, "power_measured_at")),
    ("power_consumption", "not_null:total_isis_power_mw",
      notNull(_, "total_isis_power_mw")))

  /** Every declared test across the warehouse — what `elt test` runs. */
  def fullSuite: Seq[(String, String, DataFrame => DataFrame)] =
    acceleratorSuite ++ beamlinesSuite ++ estatesSuite
}
