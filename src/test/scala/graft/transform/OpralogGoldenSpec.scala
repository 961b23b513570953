package graft.transform

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tables.LakeCatalog

/** The reference's dbt unit tests with golden rows
  * (`stg_opralogweb__mcr_equipment_downtime.yml:8-41`,
  * `stg_statusdisplay__cycles.yml:8-25`, fixtures under
  * `transform/tests/fixtures/` — transcribed in FIXTURES.md §1), plus
  * an end-to-end mart run (SURVEY §7.2).
  */
class OpralogGoldenSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = java.sql.Date.valueOf(s)

  /** base-level fixtures, spliced in place of the base models like dbt does. */
  private def baseFixtures: Map[String, DataFrame] = Map(
    "base_opralogweb__entries" -> Seq(
      (100, ts("2017-04-25 23:59:59"), d("2017-04-24"), "Comment 100", false),
      (101, ts("2024-01-01 00:00:01"), d("2024-01-01"), "Comment 101", false),
      (102, ts("2024-01-01 00:01:03"), d("2024-01-01"), "Deleted 102", true))
      .toDF("entry_id", "fault_occurred_at", "fault_date", "fault_description",
        "logically_deleted"),
    "base_opralogweb__chapter_entry" -> Seq(
      (100, 24, 1, 24), (101, 24, 2, 24), (102, 24, 2, 24))
      .toDF("entry_id", "principal_logbook", "logbook_chapter_no", "logbook_id"),
    "base_opralogweb__logbook_chapter" -> Seq(1, 2).toDF("logbook_chapter_no"),
    "base_opralogweb__logbooks" -> Seq((24, "MCR Running Log"))
      .toDF("logbook_id", "logbook_name"),
    "base_opralogweb__more_entry_columns" -> Seq(
      (100, Some("Equipment 100"), None: Option[Double], 1),
      (100, Some("Group 100"), None: Option[Double], 2),
      (100, None: Option[String], Some(4.2), 3),
      (101, Some("Equipment 101"), None: Option[Double], 1),
      (101, Some("Group 101"), None: Option[Double], 2),
      (101, None: Option[String], Some(5.3), 3),
      (102, Some("Equipment 102"), None: Option[Double], 1),
      (102, Some("Group 102"), None: Option[Double], 2),
      (102, None: Option[String], Some(4.3), 3))
      .toDF("entry_id", "string_data", "number_data", "additional_column_id"),
    "base_opralogweb__additional_columns" -> Seq(
      (1, "Equipment"), (2, "Group"), (3, "Lost Time"), (4, "Group Leader comments"))
      .toDF("additional_column_id", "column_title"))

  test("golden row: stg_opralogweb__mcr_equipment_downtime discards pre-epoch " +
    "and deleted entries and pivots exactly one row") {
    val out = OpralogModels.graph.run(spark, baseFixtures,
      targets = Seq("stg_opralogweb__mcr_equipment_downtime"))(
      "stg_opralogweb__mcr_equipment_downtime")
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head == Row("Equipment 101", 5.3, d("2024-01-01"),
      ts("2024-01-01 00:00:01"), "Group 101", "Comment 101", null))
  }

  test("golden row: stg_statusdisplay__cycles joins parent/child dlt tables") {
    val fixtures = Map(
      "base_statusdisplay__cycles" -> Seq(("h344o234ii5o6o4", "2024/2"))
        .toDF("dlt_id", "name"),
      "base_statusdisplay__cycles__phases" -> Seq(
        ("user-time", 1, ts("2024-07-09 07:30:00"), ts("2024-07-24 07:30:00"),
          "h344o234ii5o6o4"))
        .toDF("phase", "target", "started_at", "ended_at", "dlt_cycles_id"))
    val out = OpralogModels.graph.run(spark, baseFixtures ++ fixtures,
      targets = Seq("stg_statusdisplay__cycles"))(
      "stg_statusdisplay__cycles")
    assert(out.collect().toSeq == Seq(Row("2024/2", ts("2024-07-09 07:30:00"),
      ts("2024-07-24 07:30:00"), "user-time", 1)))
  }

  test("base models rename/clean raw landing tables") {
    val raw = Map(
      "accelerator_opralogweb.entries" -> Seq(
        (100, ts("2024-01-01 10:00:00"), " spaced  comment ", "N"),
        (101, ts("2024-01-02 11:00:00"), "x", "Y"))
        .toDF("entry_id", "entry_timestamp", "additional_comment", "logically_deleted"),
      "accelerator_opralogweb.chapter_entry" -> Seq((100, 24, 1, 24))
        .toDF("entry_id", "principal_logbook", "logbook_chapter_no", "logbook_id"),
      "accelerator_opralogweb.logbook_chapter" -> Seq(Tuple1(1)).toDF("logbook_chapter_no"),
      "accelerator_opralogweb.logbooks" -> Seq((24, "MCR Running Log"))
        .toDF("logbook_id", "logbook_name"),
      "accelerator_opralogweb.more_entry_columns" -> Seq(
        (100, "a   b", Some(1.0), 1)).toDF("entry_id", "col_data", "number_value",
        "additional_column_id"),
      "accelerator_opralogweb.additional_columns" -> Seq((1, " Equipment "))
        .toDF("additional_column_id", "col_title"))
    val built = OpralogModels.graph.run(spark, targets = Seq(
      "base_opralogweb__entries", "base_opralogweb__more_entry_columns",
      "base_opralogweb__additional_columns", "stg_statusdisplay__cycles"),
      sources = raw ++ Map(
      "base_statusdisplay__cycles" -> Seq(("id1", "c")).toDF("dlt_id", "name"),
      "base_statusdisplay__cycles__phases" ->
        Seq(("p", 1, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), "id1"))
          .toDF("phase", "target", "started_at", "ended_at", "dlt_cycles_id"),
      "accelerator_accelerator_sharepoint.edr_equipment_mapping" ->
        Seq(("E", "cat")).toDF("equipment_name", "equipment_category"),
      "accelerator_accelerator_sharepoint.equipment_downtime_data_11_08_24" ->
        Seq(("E", "24/2", 1.0, "2024-01-01 00:00:00", "xx12:00:00", "g", "fd", "mc"))
          .toDF("equipment", "user_run", "downtime_minutesx", "fault_date",
            "fault_time", "group", "fault_description", "managerscomments")))
    val entries = built("base_opralogweb__entries").orderBy("entry_id").collect()
    assert(entries(0) == Row(100, ts("2024-01-01 10:00:00"), d("2024-01-01"),
      "spaced  comment", false))
    assert(entries(1).getBoolean(4) == true) // 'Y' -> true
    val mec = built("base_opralogweb__more_entry_columns").collect().head
    assert(mec.getString(1) == "a b") // normalize_whitespace
    val ac = built("base_opralogweb__additional_columns").collect().head
    assert(ac.getString(1) == "Equipment") // trim
  }

  test("mart mcr_equipment_downtime_records: splice, interval join, union " +
    "distinct, interval arithmetic, lag uptime, categorization, partition spec") {
    val catalog = new LakeCatalog(tmpDir("marts"))
    val sharepoint = Seq(
      // pre-splice history; user_run '.96/1' -> 1996/1
      ("Pump  A", ".96/1", 2.0, "2017-05-01 00:00:00", "xy01:00:00", "g1", "f1", "m1"),
      ("Pump  A", "17/2", 3.0, "2017-06-01", "02:00:00", "g1", "f2", "m2"))
      .toDF("equipment", "user_run", "downtime_minutesx", "fault_date",
        "fault_time", "group", "fault_description", "managerscomments")
    val mapping = Seq(("Pump  A ", "Rotating"), ("PUMP  a", "RotatingDup"))
      .toDF("equipment_name", "equipment_category")
    val cyclesFix = Map(
      "base_statusdisplay__cycles" -> Seq(("c1", "2024/1")).toDF("dlt_id", "name"),
      "base_statusdisplay__cycles__phases" -> Seq(
        ("user-time", 1, ts("2023-12-01 00:00:00"), ts("2024-02-01 00:00:00"), "c1"))
        .toDF("phase", "target", "started_at", "ended_at", "dlt_cycles_id"))
    // two opralog faults for the same equipment+cycle to exercise the lag
    val entries2 = baseFixtures + ("base_opralogweb__entries" -> Seq(
      (101, ts("2024-01-01 00:00:01"), d("2024-01-01"), "Comment 101", false),
      (103, ts("2024-01-01 02:00:01"), d("2024-01-01"), "Comment 103", false))
      .toDF("entry_id", "fault_occurred_at", "fault_date", "fault_description",
        "logically_deleted")) +
      ("base_opralogweb__chapter_entry" -> Seq((101, 24, 2, 24), (103, 24, 2, 24))
        .toDF("entry_id", "principal_logbook", "logbook_chapter_no", "logbook_id")) +
      ("base_opralogweb__more_entry_columns" -> Seq(
        (101, Some("Pump  A"), None: Option[Double], 1),
        (101, Some("Group 101"), None: Option[Double], 2),
        (101, None: Option[String], Some(5.0), 3),
        (103, Some("Pump  A"), None: Option[Double], 1),
        (103, Some("Group 103"), None: Option[Double], 2),
        (103, None: Option[String], Some(4.0), 3))
        .toDF("entry_id", "string_data", "number_data", "additional_column_id"))

    val sources = entries2 ++ cyclesFix ++ Map(
      "accelerator_accelerator_sharepoint.equipment_downtime_data_11_08_24" -> sharepoint,
      "accelerator_accelerator_sharepoint.edr_equipment_mapping" -> mapping)
    val built = OpralogModels.graph.run(spark, sources,
      catalog = Some((catalog, "facility_ops", "accelerator")),
      targets = Seq("mcr_equipment_downtime_records",
        "mcr_equipment_downtime_uncategorized_equipment"))
    val records = built("mcr_equipment_downtime_records")
      .orderBy("fault_occurred_at").collect()

    assert(records.length == 4) // 2 sharepoint + 2 opralog (post-splice)
    val bySrc = records.map(r => (r.getAs[String]("fault_description"), r))
      .toMap
    // year expansion (Q9)
    assert(bySrc("f1").getAs[String]("cycle_name") == "1996/1")
    assert(bySrc("f2").getAs[String]("cycle_name") == "2017/2")
    // sharepoint branch padded with NULL cycle_phase (Q19)
    assert(bySrc("f1").getAs[String]("cycle_phase") == null)
    // opralog rows joined to the cycle window (Q20)
    assert(bySrc("Comment 101").getAs[String]("cycle_name") == "2024/1")
    assert(bySrc("Comment 101").getAs[String]("cycle_phase") == "user-time")
    // first fault of the (cycle, equipment) group has NULL uptime; the
    // second sees lag: up_at = 00:00:01+5min = 00:05:01; fault2 02:00:01
    // -> 115 whole minutes (Q23+Q24)
    assert(bySrc("Comment 101").isNullAt(
      bySrc("Comment 101").fieldIndex("uptime_before_fault_mins")))
    assert(bySrc("Comment 103").getAs[Long]("uptime_before_fault_mins") == 115L)
    // categorization via normalized key (Q25): min dedup picks 'Rotating'
    assert(bySrc("Comment 101").getAs[String]("equipment_category") == "Rotating")
    // equipment normalized for output (Q2)
    assert(bySrc("Comment 101").getAs[String]("equipment") == "Pump A")
    // sharepoint-era equipment also categorized (same key)
    assert(bySrc("f1").getAs[String]("equipment_category") == "Rotating")

    // Q28: mart is a real partitioned table on disk
    val loc = catalog.tableLocation("facility_ops", "accelerator",
      "mcr_equipment_downtime_records")
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(loc, "data", "snap-0", "cycle_name=2024%2F1")) ||
      graft.tables.LakeTable.load(spark, loc).metadata.partitionSpec.nonEmpty)

    // Q27: uncategorized view is empty here
    assert(built("mcr_equipment_downtime_uncategorized_equipment").count() == 0)
  }

  test("model graph rejects cycles and unknown refs") {
    val cyclic = new ModelGraph(Seq(
      Model("a", Seq("b"), (_, r) => r("b")),
      Model("b", Seq("a"), (_, r) => r("a"))))
    intercept[IllegalStateException](cyclic.topoOrder)
    intercept[NoSuchElementException] {
      new ModelGraph(Seq(Model("a", Seq("nope"), (_, r) => r("nope"))))
        .run(spark, Map.empty)
    }
  }
}
