package graft.transform

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tables.LakeCatalog

/** The beamlines/estates projection models and their partitioned marts
  * (power_consumption.sql, incident_monitor_peaks.sql). */
class BeamlinesModelsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("monitor_peaks -> incident_monitor_peaks mart partitioned by beamline") {
    val catalog = new LakeCatalog(tmpDir("beam"))
    val peaks = Seq(
      ("beamA", 1L, "cycle_24_1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        2.0, 4800.0, 1.0, 19.0, 0.1, 1400.0, 2.0),
      ("beamB", 2L, "cycle_24_1", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
        2.0, 4900.0, 1.0, 18.0, 0.1, 1500.0, 2.0))
      .toDF("beamline", "run_number", "cycle_name", "run_start", "proton_charge",
        "peak_centre", "peak_centre_error", "peak_amplitude",
        "peak_amplitude_error", "peak_sigma", "peak_sigma_error")
    val built = OpralogModels.graph.run(spark,
      Map("beamlines_moderator_performance.monitor_peaks" -> peaks),
      catalog = Some((catalog, "facility_ops", "beamlines")),
      targets = Seq("incident_monitor_peaks"))
    val mart = built("incident_monitor_peaks")
    assert(mart.columns.toSeq ==
      Seq("beamline", "run_number", "cycle_name", "run_start", "peak_centre"))
    assert(mart.count() == 2)
    val loc = catalog.tableLocation("facility_ops", "beamlines", "incident_monitor_peaks")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(loc, "data", "snap-0", "beamline=beamA")))
  }

  test("rdm_data -> power_consumption mart partitioned by year") {
    val catalog = new LakeCatalog(tmpDir("estates"))
    val rdm = Seq(
      (java.sql.Timestamp.valueOf("2023-06-01 00:00:00"), 120.5, "a.csv"),
      (java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 130.5, "b.csv"))
      .toDF("date_time", "isis_elec_total_power_mw", "file_name")
    val built = OpralogModels.graph.run(spark,
      Map("estates_electricity_sharepoint.rdm_data" -> rdm),
      catalog = Some((catalog, "facility_ops", "estates")),
      targets = Seq("power_consumption"))
    val mart = built("power_consumption")
    assert(mart.columns.toSeq == Seq("power_measured_at", "total_isis_power_mw"))
    val loc = catalog.tableLocation("facility_ops", "estates", "power_consumption")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(loc, "data", "snap-0", "power_measured_at_year=2023")))

    // partition pruning: a year filter on the derived partition column
    // reaches the scan as a PartitionFilter (only 2024 dirs read)
    val pruned = catalog.loadTable(spark, "facility_ops", "estates",
        "power_consumption").readWithPartitions()
      .where(col("power_measured_at_year") === 2024)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("power_measured_at_year"), plan.take(600))
    assert(pruned.count() == 1)
  }
}
