package graft.transform

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TrinoFunctions._
import graft.tables.PartitionField

/** The reference's dbt transform layer, model by model, Spark-first.
  * Sources are the landing tables (snake_case, as dlt writes them).
  *
  * File citations are to
  * `/root/reference/warehouses/facility_ops/transform/models/`.
  */
object OpralogModels {

  /** base_opralogweb__entries (staging/accelerator/base_opralogweb__entries.sql):
    * rename + with_timezone(UTC) no-op + ts->date + 'Y'-flag->boolean. */
  private def baseEntries(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("accelerator_opralogweb.entries").select(
      col("entry_id"),
      col("entry_timestamp").as("fault_occurred_at"), // with_timezone(_, 'UTC') on naive UTC
      col("entry_timestamp").cast("date").as("fault_date"),
      trim(col("additional_comment")).as("fault_description"),
      charFlag(col("logically_deleted")).as("logically_deleted"))

  private def baseChapterEntry(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("accelerator_opralogweb.chapter_entry")
      .select("entry_id", "principal_logbook", "logbook_chapter_no", "logbook_id")

  private def baseLogbookChapter(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("accelerator_opralogweb.logbook_chapter").select("logbook_chapter_no")

  private def baseLogbooks(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("accelerator_opralogweb.logbooks").select("logbook_id", "logbook_name")

  /** normalize_whitespace on the EAV string column
    * (base_opralogweb__more_entry_columns.sql:12). */
  private def baseMoreEntryColumns(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("accelerator_opralogweb.more_entry_columns").select(
      col("entry_id"),
      normalizeWhitespace(col("col_data")).as("string_data"),
      col("number_value").as("number_data"),
      col("additional_column_id"))

  private def baseAdditionalColumns(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("accelerator_opralogweb.additional_columns").select(
      col("additional_column_id"), trim(col("col_title")).as("column_title"))

  /** stg_opralogweb__mcr_equipment_downtime
    * (stg_opralogweb__mcr_equipment_downtime.sql:29-94): 4-way inner +
    * 2 left-outer joins (Q12), compound filter with IN-list and same-row
    * column equality (Q13), EAV pivot via min(case) grouped on the fault
    * identity (Q14), HAVING-style post-filter (Q15). */
  private def stgMcrEquipmentDowntime(s: SparkSession, ref: String => DataFrame): DataFrame = {
    val entries = ref("base_opralogweb__entries").as("e")
    val chapterEntry = ref("base_opralogweb__chapter_entry").as("ce")
    val logbookChapter = ref("base_opralogweb__logbook_chapter").as("lc")
    val logbooks = ref("base_opralogweb__logbooks").as("lb")
    val moreCols = ref("base_opralogweb__more_entry_columns").as("mec")
    val addCols = ref("base_opralogweb__additional_columns").as("ac")

    val denormalized = entries
      .join(chapterEntry, col("ce.entry_id") === col("e.entry_id"))
      .join(logbookChapter, col("lc.logbook_chapter_no") === col("ce.logbook_chapter_no"))
      .join(logbooks, col("lb.logbook_id") === col("ce.logbook_id"))
      .join(moreCols, col("mec.entry_id") === col("e.entry_id"), "left_outer")
      .join(addCols, col("ac.additional_column_id") === col("mec.additional_column_id"),
        "left_outer")
      .where(col("e.logically_deleted") === false &&
        col("e.fault_date") >= to_date(lit("2017-04-25")) && // OPRALOG_EPOCH, Q11
        col("lb.logbook_name") === "MCR Running Log" &&
        col("ce.logbook_id") === col("ce.principal_logbook") &&
        col("ac.column_title").isin("Equipment", "Group", "Lost Time",
          "Group Leader comments") &&
        (col("mec.string_data").isNotNull || col("mec.number_data").isNotNull))
      .select(col("e.entry_id"), col("e.fault_occurred_at"), col("e.fault_date"),
        col("ac.column_title"), col("mec.string_data"), col("mec.number_data"),
        col("e.fault_description"))

    denormalized
      .groupBy(col("fault_occurred_at"), col("fault_date"), col("fault_description"))
      .agg(
        min(when(col("column_title") === "Equipment", col("string_data"))).as("equipment"),
        min(when(col("column_title") === "Lost Time", col("number_data"))).as("downtime_mins"),
        min(when(col("column_title") === "Group", col("string_data"))).as("group"),
        min(when(col("column_title") === "Group Leader comments", col("string_data")))
          .as("managers_comments"))
      .where(col("equipment").isNotNull && col("downtime_mins").isNotNull &&
        col("group").isNotNull)
      .select("equipment", "downtime_mins", "fault_date", "fault_occurred_at",
        "group", "fault_description", "managers_comments")
  }

  /** stg_statusdisplay__cycles (stg_statusdisplay__cycles.sql:20-32): join
    * dlt parent/child tables on _dlt_id = _dlt_parent_id (Q16). */
  private def stgStatusdisplayCycles(s: SparkSession, ref: String => DataFrame): DataFrame = {
    val cycles = ref("base_statusdisplay__cycles")
    val phases = ref("base_statusdisplay__cycles__phases")
    cycles.join(phases, cycles("dlt_id") === phases("dlt_cycles_id"))
      .select(cycles("name"), phases("started_at"), phases("ended_at"),
        phases("phase"), phases("target"))
  }

  /** stg_accelerator_sharepoint__edr_equipment_mapping
    * (stg_accelerator_sharepoint__edr_equipment_mapping.sql:7-18): dedup by
    * lowered normalized key with any_value (Q18; min for determinism). */
  private def stgEdrEquipmentMapping(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("accelerator_accelerator_sharepoint.edr_equipment_mapping")
      .groupBy(categoryKey(col("equipment_name")).as("equipment"))
      .agg(min(col("equipment_category")).as("equipment_category"))

  /** stg_accelerator_sharepoint__equipment_downtime_data_11_08_24
    * (…_11_08_24.sql): substring crops incl. Trino negative start (Q8),
    * 2->4-digit year fixup (Q9), date() parse (Q10), Europe/London->UTC
    * parse (Q4). */
  private def stgSharepointDowntime(s: SparkSession, ref: String => DataFrame): DataFrame = {
    val src = ref("accelerator_accelerator_sharepoint.equipment_downtime_data_11_08_24")
    val cropped = src.select(
      col("equipment"), col("user_run"), col("downtime_minutesx"),
      substring(col("fault_date"), 1, 10).as("fault_date_str"),
      lastChars(col("fault_time"), 8).as("fault_time_str"),
      col("group"), col("fault_description"), col("managerscomments"))
    cropped.select(
      col("equipment"),
      when(col("user_run").like(".%"),
        regexp_replace(col("user_run"), "\\.", "19"))
        .otherwise(concat(lit("20"), col("user_run"))).as("cycle_name"),
      col("downtime_minutesx").as("downtime_mins"),
      to_date(col("fault_date_str")).as("fault_date"),
      parseUtcTimestamp(col("fault_date_str"), col("fault_time_str"),
        "Europe/London").as("fault_occurred_at"),
      col("group"), col("fault_description"),
      col("managerscomments").as("managers_comments"))
  }

  /** marts/accelerator/cycles.sql:15-26: GROUP BY all-columns dedup dropping
    * `target` (Q17). */
  private def martCycles(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("stg_statusdisplay__cycles")
      .select("name", "started_at", "ended_at", "phase")
      .distinct()

  /** marts/accelerator/mcr_equipment_downtime_records.sql: NULL-cast padding
    * (Q19), interval join against cycles (Q20), scalar-subquery splice
    * (Q21), UNION distinct (Q22), interval arithmetic (Q23), window lag with
    * truncating date_diff (Q24), normalized-key categorization join (Q25),
    * final ORDER BY as write sort (Q26). */
  private def martDowntimeRecords(s: SparkSession, ref: String => DataFrame): DataFrame = {
    val sharepoint = ref("stg_accelerator_sharepoint__equipment_downtime_data_11_08_24")
      .select(col("equipment"), col("fault_date"), col("cycle_name"),
        lit(null).cast("string").as("cycle_phase"), // Q19
        col("downtime_mins"), col("fault_occurred_at"), col("group"),
        col("fault_description"), col("managers_comments"))

    val cycles = ref("cycles")
    val spliceCut = sharepoint.agg(max(col("fault_occurred_at")).as("cut"))
    val opralog = ref("stg_opralogweb__mcr_equipment_downtime").as("r")
      // Q21: uncorrelated scalar subquery — kept in-plan as a broadcast of
      // the 1-row aggregate (Catalyst's own rewrite of scalar subqueries)
      .join(broadcast(spliceCut))
      .where(col("fault_occurred_at") > col("cut"))
      // Q20: interval join; cycles is tiny -> broadcast nested loop
      .join(broadcast(cycles.as("c")),
        col("r.fault_occurred_at").between(col("c.started_at"), col("c.ended_at")),
        "left_outer")
      .select(col("r.equipment"), col("r.fault_date"),
        col("c.name").as("cycle_name"), col("c.phase").as("cycle_phase"),
        col("r.downtime_mins"), col("r.fault_occurred_at"), col("r.group"),
        col("r.fault_description"), col("r.managers_comments"))

    val allRecords = sharepoint.union(opralog).distinct() // Q22: UNION, not UNION ALL

    // Q23: fault_occurred_at + downtime_mins * INTERVAL '1' MINUTE (double
    // minutes -> whole seconds at Trino's timestamp(6) precision)
    val withUpAt = allRecords
      .withColumn("__up_secs", round(col("downtime_mins") * 60).cast("long"))
      .withColumn("equipment_up_at",
        expr("timestampadd(SECOND, __up_secs, fault_occurred_at)"))
      .drop("__up_secs")

    // Q24: lag + truncating date_diff minutes
    val w = Window.partitionBy(col("cycle_name"), col("equipment"))
      .orderBy(col("fault_occurred_at"))
    val withUptime = withUpAt.withColumn("uptime_before_fault_mins",
      dateDiffMinutesTrunc(lag(col("equipment_up_at"), 1).over(w),
        col("fault_occurred_at")))

    // Q25: left join on the normalized category key
    val mappings = ref("stg_accelerator_sharepoint__edr_equipment_mapping").as("m")
    withUptime.as("u")
      .join(broadcast(mappings),
        categoryKey(col("u.equipment")) === col("m.equipment"), "left_outer")
      .select(
        normalizeWhitespace(col("u.equipment")).as("equipment"),
        col("m.equipment_category"), col("u.fault_date"), col("u.cycle_name"),
        col("u.cycle_phase"), col("u.downtime_mins"), col("u.fault_occurred_at"),
        col("u.equipment_up_at"), col("u.uptime_before_fault_mins"),
        col("u.group"), col("u.fault_description"), col("u.managers_comments"))
      .orderBy(col("fault_occurred_at").asc) // Q26: write sort
  }

  /** mcr_equipment_downtime_uncategorized_equipment.sql:8-16 (Q27). */
  private def martUncategorized(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("mcr_equipment_downtime_records")
      .where(col("equipment_category").isNull)
      .select(col("equipment").as("uncategorized_equipment"))
      .distinct()

  /** staging/beamlines/stg_moderator_performance__monitor_peaks.sql and
    * staging/estates/stg_electricity_sharepoint_rdm_data.sql: projection /
    * rename staging models. */
  private def stgMonitorPeaks(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("beamlines_moderator_performance.monitor_peaks").select(
      "beamline", "run_number", "cycle_name", "run_start", "proton_charge",
      "peak_centre", "peak_centre_error", "peak_amplitude",
      "peak_amplitude_error", "peak_sigma", "peak_sigma_error")

  private def stgRdmData(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("estates_electricity_sharepoint.rdm_data").select(
      col("date_time").as("power_measured_at"),
      col("isis_elec_total_power_mw").as("total_isis_power_mw"))

  /** marts/accelerator/power_consumption.sql (partitioned
    * year(power_measured_at)) and marts/beamlines/incident_monitor_peaks.sql
    * (partitioned beamline). */
  private def martPowerConsumption(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("stg_electricity_sharepoint_rdm_data")
      .select("power_measured_at", "total_isis_power_mw")

  private def martIncidentMonitorPeaks(s: SparkSession, ref: String => DataFrame): DataFrame =
    ref("stg_moderator_performance__monitor_peaks")
      .select("beamline", "run_number", "cycle_name", "run_start", "peak_centre")

  /** The full graph (Q29); sources are landing tables keyed
    * `namespace.table`. */
  val graph: ModelGraph = new ModelGraph(Seq(
    Model("base_opralogweb__entries", Seq("accelerator_opralogweb.entries"), baseEntries),
    Model("base_opralogweb__chapter_entry", Seq("accelerator_opralogweb.chapter_entry"), baseChapterEntry),
    Model("base_opralogweb__logbook_chapter", Seq("accelerator_opralogweb.logbook_chapter"), baseLogbookChapter),
    Model("base_opralogweb__logbooks", Seq("accelerator_opralogweb.logbooks"), baseLogbooks),
    Model("base_opralogweb__more_entry_columns", Seq("accelerator_opralogweb.more_entry_columns"), baseMoreEntryColumns),
    Model("base_opralogweb__additional_columns", Seq("accelerator_opralogweb.additional_columns"), baseAdditionalColumns),
    // base_statusdisplay__cycles(.sql:9-16) / __phases(.sql:10-19): rename
    // the dlt-normalized landing columns (_dlt_id/label, type/start/end).
    Model("base_statusdisplay__cycles", Seq("accelerator_statusdisplay.cycles"),
      (_, ref) => ref("accelerator_statusdisplay.cycles").select(
        col("_dlt_id").as("dlt_id"), col("label").as("name"))),
    Model("base_statusdisplay__cycles__phases", Seq("accelerator_statusdisplay.cycles__phases"),
      (_, ref) => ref("accelerator_statusdisplay.cycles__phases").select(
        col("type").as("phase"), col("target"),
        col("start").as("started_at"), col("end").as("ended_at"),
        col("_dlt_parent_id").as("dlt_cycles_id"))),
    Model("stg_opralogweb__mcr_equipment_downtime",
      Seq("base_opralogweb__entries", "base_opralogweb__chapter_entry",
        "base_opralogweb__logbook_chapter", "base_opralogweb__logbooks",
        "base_opralogweb__more_entry_columns", "base_opralogweb__additional_columns"),
      stgMcrEquipmentDowntime),
    Model("stg_statusdisplay__cycles",
      Seq("base_statusdisplay__cycles", "base_statusdisplay__cycles__phases"),
      stgStatusdisplayCycles),
    Model("stg_accelerator_sharepoint__edr_equipment_mapping",
      Seq("accelerator_accelerator_sharepoint.edr_equipment_mapping"),
      stgEdrEquipmentMapping),
    Model("stg_accelerator_sharepoint__equipment_downtime_data_11_08_24",
      Seq("accelerator_accelerator_sharepoint.equipment_downtime_data_11_08_24"),
      stgSharepointDowntime),
    Model("cycles", Seq("stg_statusdisplay__cycles"), martCycles,
      materialized = "table"),
    Model("mcr_equipment_downtime_records",
      Seq("stg_accelerator_sharepoint__equipment_downtime_data_11_08_24",
        "stg_opralogweb__mcr_equipment_downtime", "cycles",
        "stg_accelerator_sharepoint__edr_equipment_mapping"),
      martDowntimeRecords,
      materialized = "table",
      partitionSpec = Seq(PartitionField("cycle_name", "identity"))),
    Model("mcr_equipment_downtime_uncategorized_equipment",
      Seq("mcr_equipment_downtime_records"), martUncategorized),
    Model("stg_moderator_performance__monitor_peaks",
      Seq("beamlines_moderator_performance.monitor_peaks"), stgMonitorPeaks),
    Model("stg_electricity_sharepoint_rdm_data",
      Seq("estates_electricity_sharepoint.rdm_data"), stgRdmData),
    Model("power_consumption", Seq("stg_electricity_sharepoint_rdm_data"),
      martPowerConsumption, materialized = "table",
      partitionSpec = Seq(PartitionField("power_measured_at", "year"))),
    Model("incident_monitor_peaks", Seq("stg_moderator_performance__monitor_peaks"),
      martIncidentMonitorPeaks, materialized = "table",
      partitionSpec = Seq(PartitionField("beamline", "identity")),
      schema = Some("beamlines")))) // dbt_project.yml: marts/beamlines +schema
}
