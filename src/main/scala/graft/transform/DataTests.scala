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

  /** The reference's declared data tests for the accelerator models. */
  def acceleratorSuite: Seq[(String, String, DataFrame => DataFrame)] = Seq(
    ("cycles", "not_null:name", notNull(_, "name")),
    ("cycles", "not_null:started_at", notNull(_, "started_at")),
    ("cycles", "accepted_values:phase",
      acceptedValues(_, "phase", Seq("run-up", "user-time", "machine-physics"))),
    ("stg_opralogweb__mcr_equipment_downtime", "not_null:equipment",
      notNull(_, "equipment")),
    ("mcr_equipment_downtime_records", "not_null:fault_occurred_at",
      notNull(_, "fault_occurred_at")))
}
