package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.runner.Cli
import graft.tables.LakeCatalog

/** Two-run incremental ingest e2e, porting the reference's
  * `warehouses/facility_ops_landing/ingest/accelerator/opralogweb/tests/
  * test_extract_and_load.py:49-120`: run 1 loads the fake source, the
  * source is updated (new + changed rows), run 2 must append new
  * ChapterEntry rows, upsert changed Entries/MoreEntryColumns, and keep
  * entry ids unique. */
class OpralogE2eSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeSource(dir: String, entryIds: Range,
                          changed: Map[Int, (String, Double, Timestamp)],
                          newSince: Int = Int.MaxValue): Unit = {
    def comment(i: Int) =
      changed.get(i).map(_._1).getOrElse(s"<b>Fault</b> in <i>magnet</i>&nbsp;$i")
    def lostTime(i: Int) = changed.get(i).map(_._2).getOrElse(5.1)
    def lastChanged(i: Int) =
      changed.get(i).map(_._3).getOrElse(
        // rows added after run 1 carry a fresh LastChangedDate, like the
        // reference's fake source on update
        if (i >= newSince) ts("2024-05-01 00:00:00") else ts("2020-01-01 00:00:00"))

    Seq((24, "MCR Running Log"), (25, "Beam Physics"))
      .toDF("LogbookId", "LogbookName")
      .write.mode("overwrite").parquet(s"$dir/Logbooks.parquet")
    (1 to 5).map(i => (i, 24)).toDF("LogbookChapterNo", "LogbookId")
      .write.mode("overwrite").parquet(s"$dir/LogbookChapter.parquet")
    Seq((1, "Equipment"), (2, "Group"), (3, "Lost Time"), (4, "Group Leader comments"))
      .toDF("AdditionalColumnId", "ColTitle")
      .write.mode("overwrite").parquet(s"$dir/AdditionalColumns.parquet")
    entryIds.map(i => (i.toLong, i, 24, 1 + i % 5, 24))
      .toDF("LogbookEntryId", "EntryId", "PrincipalLogbook", "LogbookChapterNo", "LogbookId")
      .write.mode("overwrite").parquet(s"$dir/ChapterEntry.parquet")
    entryIds.map(i => (i, ts("2024-01-01 10:00:00"), lastChanged(i), comment(i), "N"))
      .toDF("EntryId", "EntryTimestamp", "LastChangedDate", "AdditionalComment",
        "LogicallyDeleted")
      .write.mode("overwrite").parquet(s"$dir/Entries.parquet")
    entryIds.flatMap(i => Seq(
      (i, 1, Some(s"Equipment $i"), None: Option[Double]),
      (i, 2, Some(s"Group $i"), None: Option[Double]),
      (i, 3, None: Option[String], Some(lostTime(i))),
      (i, 4, Some(s"GLC $i"), None: Option[Double])))
      .toDF("EntryId", "AdditionalColumnId", "ColData", "NumberValue")
      .write.mode("overwrite").parquet(s"$dir/MoreEntryColumns.parquet")
  }

  test("two-run incremental: append vs upsert deltas, entry-110-style update") {
    val root = tmpDir("opralog_e2e")
    val srcDir = s"$root/sources/accelerator/opralogweb"
    val catalog = new LakeCatalog(s"$root/warehouses")
    val (wh, ns) = ("facility_ops_landing", "accelerator_opralogweb")
    def landing(t: String) = catalog.loadTable(spark, wh, ns, t).read()

    // ---- run 1: 100 entries x 4 EAV rows
    writeSource(srcDir, 1 to 100, Map.empty)
    Cli.run(spark, Seq("run", root, "opralogweb"))
    assert(landing("logbooks").count() == 2)
    assert(landing("logbook_chapter").count() == 5)
    assert(landing("chapter_entry").count() == 100)
    assert(landing("entries").count() == 100)
    assert(landing("more_entry_columns").count() == 400)
    // F5: HTML stripped to markdown at extract time
    val c1 = landing("entries").where($"entry_id" === 1)
      .select("additional_comment").as[String].head()
    assert(c1 == "**Fault** in *magnet* 1")

    // ---- source update: +10 new entries, entry 50 changed (Lost Time
    // 5.1 -> 3.5, comment updated, LastChangedDate bumped)
    writeSource(srcDir, 1 to 110,
      Map(50 -> ("updated comment", 3.5, ts("2024-06-01 00:00:00"))),
      newSince = 101)

    // ---- run 2
    Cli.run(spark, Seq("run", root, "opralogweb"))
    assert(landing("chapter_entry").count() == 110) // append of new cursor rows
    assert(landing("entries").count() == 110) // upsert: no duplicates
    assert(landing("more_entry_columns").count() == 440)
    // unique entry ids (upsert on key)
    assert(landing("entries").select("entry_id").distinct().count() == 110)
    // the changed entry is visible with its new values
    assert(landing("entries").where($"entry_id" === 50)
      .select("additional_comment").as[String].head() == "updated comment")
    val lost50 = landing("more_entry_columns")
      .where($"entry_id" === 50 && $"additional_column_id" === 3)
      .select("number_value").as[Double].collect()
    assert(lost50.toSeq == Seq(3.5))
    // untouched entries were NOT re-extracted (their values unchanged)
    val lost49 = landing("more_entry_columns")
      .where($"entry_id" === 49 && $"additional_column_id" === 3)
      .select("number_value").as[Double].head()
    assert(lost49 == 5.1)

    // L8: one `_dlt_loads` row per completed run, all status 0
    val loads = landing(graft.runner.LoadBookkeeping.LoadsTable)
    assert(loads.count() == 2)
    assert(loads.where($"status" === 0).count() == 2)
    // schema versions recorded on table creation in run 1, none in run 2
    assert(landing(graft.runner.LoadBookkeeping.VersionTable).count() == 6)
    // state read-back: latest state carries the per-resource watermarks
    val state = graft.runner.LoadBookkeeping.readLatestState(
      spark, catalog, wh, ns, ns)
    assert(state.isDefined)
    assert(state.get.contains("entries") && state.get.contains("chapter_entry"))
    // identifier fields persisted from the resource merge keys
    val entriesMeta = catalog.loadTable(spark, wh, ns, "entries").metadata
    assert(entriesMeta.identifierFields == Seq("entry_id"))
  }

  test("multi-chunk extraction: small chunkSize still lands exact tables") {
    val root = tmpDir("opralog_chunked")
    val srcDir = s"$root/sources/accelerator/opralogweb"
    val catalog = new LakeCatalog(s"$root/warehouses")
    val (wh, ns) = ("facility_ops_landing", "accelerator_opralogweb")
    writeSource(srcDir, 1 to 100, Map.empty)
    // chunkSize 30 -> every big resource streams in several cursor-range
    // chunks (ranges, not row slices): same final tables, same watermarks
    val src = new OpralogSource(spark, srcDir, chunkSize = 30)
    src.run(catalog, wh, ns)
    def landing(t: String) = catalog.loadTable(spark, wh, ns, t).read()
    assert(landing("chapter_entry").count() == 100)
    assert(landing("entries").count() == 100)
    assert(landing("entries").select("entry_id").distinct().count() == 100)
    assert(landing("more_entry_columns").count() == 400)
    val wm = graft.runner.Watermark.deserialize(
      catalog.loadTable(spark, wh, ns, "chapter_entry")
        .readProperty(graft.runner.IngestRunner.PropertyWatermark))
    assert(wm == graft.runner.Watermark("logbook_entry_id", 100L))
  }

  test("cli: ls lists jobs; ambiguous/unknown names rejected") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out)(Cli.run(spark, Seq("ls", "/nonexistent")))
    assert(out.toString.contains("accelerator/opralogweb"))
    val all = Cli.jobs("/r")
    assert(Cli.findJob(all, "opralogweb").fullName == "accelerator/opralogweb")
    assert(Cli.findJob(all, "accelerator/opralogweb").name == "opralogweb")
    intercept[IllegalArgumentException](Cli.findJob(all, "nope"))
    val dup = all ++ Seq(all.head.copy(domain = "other"))
    intercept[IllegalArgumentException](Cli.findJob(dup, "opralogweb"))
  }
}
