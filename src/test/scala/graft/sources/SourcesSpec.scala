package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SourcesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ---- S4/O14: JSON normalization -----------------------------------
  test("JsonNormalizer splits list-of-struct columns into child tables " +
    "keyed _dlt_parent_id") {
    val df = spark.read.json(Seq(
      """{"label":"2024/2","cycles":[{"phase":"user-time","target":1},{"phase":"run-up","target":0}]}""",
      """{"label":"2024/3","cycles":[{"phase":"setup","target":2}]}""").toDS())
    val (parent, children) = JsonNormalizer.normalize("cycles_doc", df)
    assert(parent.columns.toSeq.contains("_dlt_id"))
    assert(parent.count() == 2)
    val child = children("cycles_doc__cycles")
    assert(child.count() == 3)
    assert(child.columns.toSet ==
      Set("phase", "target", "_dlt_parent_id", "_dlt_list_idx", "_dlt_id"))
    // referential integrity: every child points at a parent id
    val joined = child.join(parent,
      child("_dlt_parent_id") === parent("_dlt_id"))
    assert(joined.count() == 3)
    // deterministic ids: re-normalizing yields identical ids
    val (parent2, _) = JsonNormalizer.normalize("cycles_doc", df)
    assert(parent.select("_dlt_id").collect().toSet ==
      parent2.select("_dlt_id").collect().toSet)
  }

  // ---- S7: glob + mtime filter --------------------------------------
  test("globFiles matches recursively and honors modified_after") {
    val root = tmpDir("glob")
    Files.createDirectories(Paths.get(root, "a/b"))
    Files.write(Paths.get(root, "a/x.csv"), "1".getBytes)
    Files.write(Paths.get(root, "a/b/y.csv"), "2".getBytes)
    Files.write(Paths.get(root, "a/b/z.txt"), "3".getBytes)
    val all = FileSources.globFiles(root, "**/*.csv")
    assert(all.map(p => Paths.get(p).getFileName.toString).sorted == Seq("x.csv", "y.csv"))
    val future = System.currentTimeMillis() + 100000
    assert(FileSources.globFiles(root, "**/*.csv", modifiedAfter = Some(future)).isEmpty)
    assert(FileSources.globFiles(root, "**/*.csv",
      modifiedAfter = Some(0L)).size == 2)
  }

  // ---- S8: cycle-archive discovery ----------------------------------
  test("discoverCycles sorts 2-digit years as 199x < 20xx; incremental " +
    "keeps newest; runs parsed from .nxs names with skip list") {
    val root = tmpDir("archive")
    for (c <- Seq("cycle_98_5", "cycle_03_1", "cycle_24_2", "junk"))
      Files.createDirectories(Paths.get(root, c))
    val cycles = FileSources.discoverCycles(root)
    assert(cycles.map(_.name) == Seq("cycle_98_5", "cycle_03_1", "cycle_24_2"))
    assert(FileSources.cyclesFor(root, incremental = true).map(_.name) ==
      Seq("cycle_24_2"))
    val newest = cycles.last
    Files.write(Paths.get(newest.path, "INST00012345.nxs"), Array[Byte]())
    Files.write(Paths.get(newest.path, "INST00012346.nxs"), Array[Byte]())
    Files.write(Paths.get(newest.path, "notes.txt"), Array[Byte]())
    val runs = FileSources.discoverRuns(newest, skip = Set(12346L))
    assert(runs.map(_._1) == Seq(12345L))
  }

  // ---- S10: retry wrapper -------------------------------------------
  test("withRetry retries with exponential backoff capped at capMs") {
    val delays = scala.collection.mutable.ListBuffer.empty[Long]
    var calls = 0
    val r = FileSources.withRetry(attempts = 5, baseDelayMs = 100, capMs = 300,
      sleep = delays += _) {
      calls += 1
      if (calls < 4) throw new RuntimeException("flaky")
      "ok"
    }
    assert(r == "ok" && calls == 4)
    assert(delays.toSeq == Seq(100, 200, 300)) // doubled, capped
    // non-retryable errors propagate immediately
    var calls2 = 0
    intercept[IllegalStateException] {
      FileSources.withRetry(attempts = 5, retryOn = !_.isInstanceOf[IllegalStateException],
        sleep = _ => ()) { calls2 += 1; throw new IllegalStateException("fatal") }
    }
    assert(calls2 == 1)
    // exhausted attempts rethrow the last error
    intercept[RuntimeException] {
      FileSources.withRetry(attempts = 2, sleep = _ => ()) {
        throw new RuntimeException("always")
      }
    }
  }

  // ---- F1/F2/F3: electricity CSV family ------------------------------
  private val automated =
    """site information,ignore this block
      |more preamble
      |time,Date,Total Power
      |00:30:00,15/06/24,123.5
      |01:00:00,15/06/24,124.0
      |time,Date,Total Power
      |02:00:00,16/06/24,125.5
      |""".stripMargin

  test("multi-section automated CSV: preamble dropped, sections split, " +
    "dd/MM/yy + HH:mm:ss parsed, London summer time -> UTC-1h") {
    val (readings, dropped) = ElectricityCsv.parseContent("f.csv", automated)
    assert(dropped == 0)
    assert(readings.size == 3)
    // 00:30 BST == 23:30 UTC previous day
    assert(readings.head.dateTimeUtc ==
      java.sql.Timestamp.valueOf("2024-06-14 23:30:00"))
    assert(readings.head.powerMw == 123.5)
  }

  test("manual-format section (single datetime column) parses") {
    val manual =
      """time,Power MW
        |15/01/24 10:00:00,99.5
        |""".stripMargin
    val (readings, dropped) = ElectricityCsv.parseContent("m.csv", manual)
    assert(dropped == 0)
    // January: GMT == UTC
    assert(readings.head.dateTimeUtc ==
      java.sql.Timestamp.valueOf("2024-01-15 10:00:00"))
  }

  test("sections containing DST-ambiguous times are dropped entirely (F3)") {
    // 2024-10-27 01:30 occurred twice in Europe/London (clocks back at 02:00)
    val ambiguous =
      """time,Date,Total Power
        |01:30:00,27/10/24,50.0
        |time,Date,Total Power
        |12:00:00,27/10/24,60.0
        |""".stripMargin
    val (readings, dropped) = ElectricityCsv.parseContent("a.csv", ambiguous)
    assert(dropped == 1)
    assert(readings.map(_.powerMw) == Seq(60.0))
    // spring-forward gap is likewise a problem
    assert(ElectricityCsv.isDstProblem(
      java.time.LocalDateTime.parse("2024-03-31T01:30:00")))
  }

  test("readFiles distributes parse over files (F6)") {
    val dir = tmpDir("elec")
    Files.write(Paths.get(dir, "one.csv"), automated.getBytes)
    Files.write(Paths.get(dir, "two.csv"),
      "time,Power\n15/01/24 10:00:00,99.5\n".getBytes)
    val df = ElectricityCsv.readFiles(spark,
      FileSources.globFiles(dir, "*.csv"), parallelism = 2)
    assert(df.count() == 4)
    assert(df.columns.toSeq ==
      Seq("date_time", "isis_elec_total_power_mw", "file_name"))
    assert(df.select("file_name").distinct().count() == 2)
  }
}
