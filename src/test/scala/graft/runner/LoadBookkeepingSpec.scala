package graft.runner

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tables.LakeCatalog

/** L8: the three dlt system tables and the filter+sort-desc+first state
  * sync (`pyiceberg.py:160-293`, e2e `test_pyiceberg_pipeline.py:59-87`). */
class LoadBookkeepingSpec extends AnyFunSuite with SparkSpec {

  test("completeLoad + state sync returns the newest completed state") {
    val catalog = new LakeCatalog(tmpDir("bk"))
    val (wh, ns) = ("w", "n")
    LoadBookkeeping.completeLoad(spark, catalog, wh, ns, "1700000001", "pipe", "h1")
    LoadBookkeeping.writeState(spark, catalog, wh, ns, "pipe", 1, """{"v":1}""", "1700000001")
    LoadBookkeeping.completeLoad(spark, catalog, wh, ns, "1700000002", "pipe", "h2")
    LoadBookkeeping.writeState(spark, catalog, wh, ns, "pipe", 2, """{"v":2}""", "1700000002")
    // a state row whose load never completed must not win
    LoadBookkeeping.writeState(spark, catalog, wh, ns, "pipe", 3, """{"v":3}""", "1700000003")

    assert(LoadBookkeeping.readLatestState(spark, catalog, wh, ns, "pipe")
      .contains("""{"v":2}"""))
    assert(LoadBookkeeping.lastLoadId(spark, catalog, wh, ns).contains("1700000002"))
    // unknown pipeline -> None
    assert(LoadBookkeeping.readLatestState(spark, catalog, wh, ns, "other").isEmpty)
    // all three system tables exist
    for (t <- Seq("_dlt_loads", "_dlt_pipeline_state"))
      assert(catalog.tableExists(wh, ns, t))
    LoadBookkeeping.recordSchemaVersion(spark, catalog, wh, ns, "pipe", 1, "h1", "{}")
    assert(catalog.tableExists(wh, ns, "_dlt_version"))
  }

  test("empty namespace: reads return None") {
    val catalog = new LakeCatalog(tmpDir("bk2"))
    assert(LoadBookkeeping.readLatestState(spark, catalog, "w", "n", "p").isEmpty)
    assert(LoadBookkeeping.lastLoadId(spark, catalog, "w", "n").isEmpty)
  }
}
