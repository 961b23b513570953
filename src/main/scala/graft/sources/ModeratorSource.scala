package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fit.ModeratorFit
import graft.runner.{Resource, ResourceWriteProperties}
import graft.tables.LakeCatalog

/** The moderator_performance ingest pipeline (S8/F7,
  * `warehouses/facility_ops_landing/ingest/beamlines/moderator_performance/moderator_performance.py:97-248`):
  * walk the ISIS cycle archive for a beamline, find runs not yet fitted,
  * fit the monitor peak per run, and upsert `monitor_peaks` on
  * (beamline, run_number).
  *
  *  - archive layout: `NDX{beamline}/Instrument/data/cycle_YY_N/{BEAMLINE}{run}.nxs`
  *    (`moderator_performance.py:112-117`); incremental mode reads only the
  *    newest cycle (`:131-132`).
  *  - already-loaded runs are skipped by reading the destination table's
  *    (cycle_name, run_number) pairs for the beamline (`get_fitted_runs`,
  *    `:62-94`) — a column-pruned scan collecting only run ids.
  *  - each run's histogram is Gauss-Newton-fitted cluster-parallel
  *    ([[ModeratorFit.fitRuns]]); runs under 1 uA proton charge drop.
  *
  * The `.nxs` payload is a JSON stand-in for the HDF5 monitor histogram
  * (`fit_monitor.py:100-125` reduced to the FIXTURES.md §6 columns — no
  * HDF5 reader exists in this sandbox); the archive walk, skip logic,
  * distribution, and fit are real.
  */
final class ModeratorSource(spark: SparkSession, archiveMount: String,
                            catalog: LakeCatalog, warehouse: String,
                            namespace: String,
                            beamline: String = "PEARL",
                            incremental: Boolean = true,
                            skip: Set[Long] = Set.empty) {

  private def dataDir = s"$archiveMount/NDX$beamline/Instrument/data"

  /** Run numbers already fitted for this beamline (reference
    * `moderator_performance.py:62-94`). */
  def fittedRuns(): Set[Long] = {
    if (!catalog.tableExists(warehouse, namespace, "monitor_peaks")) return Set.empty
    catalog.loadTable(spark, warehouse, namespace, "monitor_peaks").read()
      .where(col("beamline") === beamline)
      .select("run_number")
      .collect().map(_.getLong(0)).toSet
  }

  /** Fit every new run across the discovered cycles, cluster-parallel. */
  def fitNewRuns(): DataFrame = {
    import spark.implicits._
    val skipAll = skip ++ fittedRuns()
    val work: Seq[(Long, String, String)] = for {
      cycle <- FileSources.cyclesFor(dataDir, incremental)
      (run, path) <- FileSources.discoverRuns(cycle, skipAll)
    } yield (run, path, cycle.name)
    if (work.isEmpty)
      return ModeratorFit.fitRuns(spark, spark.emptyDataset[ModeratorFit.RunHistogram])
    val bl = beamline // task closure must not capture `this`
    val runs = spark.createDataset(work)
      .repartition(math.max(1, math.min(spark.sparkContext.defaultParallelism, work.size)))
      .map { case (run, path, cycleName) =>
        ModeratorSource.parseRun(bl, run, path, cycleName) }
    ModeratorFit.fitRuns(spark, runs)
  }

  def resources: Seq[Resource] = Seq(
    Resource("monitor_peaks", _ => Iterator(fitNewRuns()),
      ResourceWriteProperties(writeMode = "merge",
        mergeOn = Seq("beamline", "run_number")), dltColumns = true))
}

object ModeratorSource {
  /** Parse the JSON histogram payload of one `.nxs` fixture file
    * (executor-side; must stay free of any driver-object capture). */
  private[sources] def parseRun(beamline: String, runNumber: Long, path: String,
                                cycleName: String): ModeratorFit.RunHistogram = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
    def d(v: JValue): Double = v match {
      case JDouble(x) => x; case JInt(x) => x.toDouble
      case JDecimal(x) => x.toDouble
      case other => throw new IllegalArgumentException(s"not a number: $other")
    }
    def arr(field: String): Array[Double] =
      (j \ field).asInstanceOf[JArray].arr.map(d).toArray
    ModeratorFit.RunHistogram(
      run_number = runNumber,
      beamline = beamline,
      cycle_name = cycleName,
      run_start = java.sql.Timestamp.from(java.time.Instant.parse(
        (j \ "start_time").asInstanceOf[JString].s)),
      proton_charge = d(j \ "proton_charge"),
      time_of_flight = arr("time_of_flight"),
      counts = arr("counts"))
  }
}
