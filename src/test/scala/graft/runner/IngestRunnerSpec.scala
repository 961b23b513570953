package graft.runner

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tables.LakeCatalog

/** Ports the runner behavior matrix of the reference's
  * `tests/unit_tests/test_runner.py:76-205` with the fake extractors of
  * `runner_extractor_fakes/` (FIXTURES.md §3). */
class IngestRunnerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def namesDf(names: String*): DataFrame = names.toSeq.toDF("name")

  private def run(resources: Seq[Resource]): (LakeCatalog, String, String) = {
    val catalog = new LakeCatalog(tmpDir("runner_wh"))
    val (wh, ns) = ("facility_ops_landing", "test_ns")
    IngestRunner.runIngest(spark, catalog, wh, ns, resources)
    (catalog, wh, ns)
  }

  test("all write modes: append, replace, merge; empty resource skipped") {
    val resources = Seq(
      Resource("table_default_write", _ => Iterator(namesDf("r1", "r2"))),
      Resource("table_replace_mode", _ => Iterator(namesDf("x")),
        ResourceWriteProperties(writeMode = "replace")),
      Resource("table_merge_mode", _ => Iterator(namesDf("m1")),
        ResourceWriteProperties(writeMode = "merge", mergeOn = Seq("name"))),
      Resource("empty", _ => Iterator(spark.emptyDataFrame.limit(0).selectExpr())))
    val resources2 = resources.map(r => r.copy(extractor = r.extractor)) // same shapes
    val (catalog, wh, ns) = run(resources)
    assert(catalog.tableExists(wh, ns, "table_default_write"))
    assert(catalog.tableExists(wh, ns, "table_replace_mode"))
    assert(catalog.tableExists(wh, ns, "table_merge_mode"))
    // zero-row resource: table never created (io.py:86-88 / test_io.py:92)
    assert(!catalog.tableExists(wh, ns, "empty"))
    // re-run: append grows, replace stays, merge dedups on key
    IngestRunner.runIngest(spark, catalog, wh, ns, resources2.take(3))
    assert(catalog.loadTable(spark, wh, ns, "table_default_write").read().count() == 4)
    assert(catalog.loadTable(spark, wh, ns, "table_replace_mode").read().count() == 1)
    assert(catalog.loadTable(spark, wh, ns, "table_merge_mode").read().count() == 1)
  }

  test("empty resource write is skipped (empty DataFrame with schema)") {
    val (catalog, wh, ns) = run(Seq(
      Resource("empty2", _ => Iterator(namesDf().limit(0)))))
    assert(!catalog.tableExists(wh, ns, "empty2"))
  }

  test("watermark stored after ingest and applied as strictly-greater filter") {
    val data = (0 until 1000).map(i => (i, s"v$i"))
    def extract(wm: Option[Watermark]): Iterator[DataFrame] = {
      val df = data.toDF("id", "value")
      Iterator(wm.map(IngestRunner.watermarkFilter(df, _)).getOrElse(df))
    }
    val catalog = new LakeCatalog(tmpDir("runner_wm"))
    val (wh, ns) = ("w", "n")
    val res = Resource("table_with_watermark", extract _,
      watermarkColumn = Some("id"))
    IngestRunner.runIngest(spark, catalog, wh, ns, Seq(res))
    val t = catalog.loadTable(spark, wh, ns, "table_with_watermark")
    assert(t.read().count() == 1000)
    assert(Watermark.deserialize(t.readProperty(IngestRunner.PropertyWatermark))
      == Watermark("id", 999L))
    // second run: watermark filter excludes everything -> zero-row chunk skipped
    IngestRunner.runIngest(spark, catalog, wh, ns, Seq(res))
    assert(t.read().count() == 1000)
  }

  test("out-of-order chunks: final stored watermark is the global max") {
    // chunk 1 = ids 10-19, chunk 2 = ids 0-9 -> stored watermark must be 19
    def extract(wm: Option[Watermark]): Iterator[DataFrame] = Iterator(
      (10 until 20).map(i => (i, s"v$i")).toDF("id", "value"),
      (0 until 10).map(i => (i, s"v$i")).toDF("id", "value"))
    val catalog = new LakeCatalog(tmpDir("runner_ooo"))
    IngestRunner.runIngest(spark, catalog, "w", "n", Seq(
      Resource("table_watermarked_out_of_order_data", extract _,
        watermarkColumn = Some("id"))))
    val t = catalog.loadTable(spark, "w", "n", "table_watermarked_out_of_order_data")
    assert(Watermark.deserialize(t.readProperty(IngestRunner.PropertyWatermark))
      == Watermark("id", 19L))
    assert(t.read().count() == 20)
  }

  test("replace with multiple chunks: first replaces, rest append") {
    def extract(wm: Option[Watermark]): Iterator[DataFrame] = Iterator(
      (0 until 500).map(i => (i, s"v$i")).toDF("id", "value"),
      (500 until 600).map(i => (i, s"v$i")).toDF("id", "value"))
    val catalog = new LakeCatalog(tmpDir("runner_rep"))
    val res = Resource("replace_multi", extract _,
      ResourceWriteProperties(writeMode = "replace"))
    IngestRunner.runIngest(spark, catalog, "w", "n", Seq(res))
    val t = catalog.loadTable(spark, "w", "n", "replace_multi")
    assert(t.read().count() == 600)
    // re-run: replace truncates again, not 1200
    IngestRunner.runIngest(spark, catalog, "w", "n", Seq(res))
    assert(t.read().count() == 600)
  }

  test("each chunk's source is evaluated exactly once (count+watermark+write fused)") {
    // Round-2 regression: the loop ran count(), agg(max), and the write as
    // three separate jobs over the raw extractor plan — 3x source reads per
    // chunk. An accumulator on the source RDD proves one evaluation now.
    val evals = spark.sparkContext.longAccumulator("source_evals")
    def extract(wm: Option[Watermark]): Iterator[DataFrame] = {
      val rdd = spark.sparkContext.parallelize(1 to 100, 2)
        .map { i => evals.add(1); org.apache.spark.sql.Row(i, s"v$i") }
      Iterator(spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.StringType)))))
    }
    val catalog = new LakeCatalog(tmpDir("runner_onepass"))
    IngestRunner.runIngest(spark, catalog, "w", "n", Seq(
      Resource("once", extract _, watermarkColumn = Some("id"))))
    assert(catalog.loadTable(spark, "w", "n", "once").read().count() == 100)
    assert(evals.value == 100L, s"source rows evaluated ${evals.value} times, expected 100")
  }

  test("dropped landing table restores its cursor from _dlt_pipeline_state") {
    val data = (0 until 100).map(i => (i, s"v$i"))
    val seenWatermarks = scala.collection.mutable.ListBuffer.empty[Option[Watermark]]
    def extract(wm: Option[Watermark]): Iterator[DataFrame] = {
      seenWatermarks += wm
      val df = data.toDF("id", "value")
      Iterator(wm.map(IngestRunner.watermarkFilter(df, _)).getOrElse(df))
    }
    val catalog = new LakeCatalog(tmpDir("runner_state"))
    val (wh, ns) = ("w", "n")
    val res = Resource("cursored", extract _, watermarkColumn = Some("id"))
    IngestRunner.runIngest(spark, catalog, wh, ns, Seq(res))
    assert(seenWatermarks.last.isEmpty) // cold start: full extract
    assert(catalog.loadTable(spark, wh, ns, "cursored").read().count() == 100)

    // landing table dropped (GC mishap / manual reset) — the cursor must
    // survive via the state table, like the reference's state restore
    // (pyiceberg.py:221-293)
    graft.tables.LakeTable.deleteRecursively(
      java.nio.file.Paths.get(catalog.tableLocation(wh, ns, "cursored")))
    assert(!catalog.tableExists(wh, ns, "cursored"))

    IngestRunner.runIngest(spark, catalog, wh, ns, Seq(res))
    // run 2's extractor received the restored watermark: NOT a full
    // re-extract — only rows past the cursor would land (none here)
    assert(seenWatermarks.last.exists(_.value == WatermarkValue.I(99L)))
    assert(!catalog.tableExists(wh, ns, "cursored")) // zero new rows

    // with fresh rows past the cursor, only the delta lands
    val more = (0 until 110).map(i => (i, s"v$i"))
    def extract2(wm: Option[Watermark]): Iterator[DataFrame] = {
      val df = more.toDF("id", "value")
      Iterator(wm.map(IngestRunner.watermarkFilter(df, _)).getOrElse(df))
    }
    IngestRunner.runIngest(spark, catalog, wh, ns,
      Seq(res.copy(extractor = extract2 _)))
    assert(catalog.loadTable(spark, wh, ns, "cursored").read().count() == 10)
  }

  test("invalid write mode and merge-without-keys rejected at config time") {
    intercept[IllegalArgumentException](ResourceWriteProperties(writeMode = "bogus"))
    intercept[IllegalArgumentException](ResourceWriteProperties(writeMode = "merge"))
    // only upsert merges exist (reference parity: delete-insert/scd2 raise)
    val e = intercept[IllegalArgumentException](ResourceWriteProperties(
      writeMode = "merge", mergeOn = Seq("id"), mergeStrategy = "delete-insert"))
    assert(e.getMessage.contains("Only 'upsert'"))
    ResourceWriteProperties(writeMode = "merge", mergeOn = Seq("id")) // default fine
  }
}
