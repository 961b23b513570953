package graft.transform

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tables.LakeCatalog

/** dbt-style incremental materialization: first run = full build; later
  * runs feed the model the existing target ({{ this }}), the model returns
  * only the delta, and the delta merges on unique_key through the
  * copy-on-write file-pruned merge — O(delta + touched files) per run,
  * never a mart rebuild. */
class IncrementalModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // per-user running totals from an append-only events source; the
  // incremental path only reads events newer than the target's high-water
  // mark and merges the recomputed totals for the touched users
  private def graph = new ModelGraph(Seq(Model(
    name = "user_totals",
    deps = Seq("events"),
    build = (_, r) => r("events")
      .groupBy("user_id")
      .agg(sum("amount").as("total"), max("ts").as("last_ts")),
    materialized = "incremental",
    uniqueKey = Seq("user_id"),
    incrementalBuild = Some { (_, r, thisTable) =>
      val ev = r("events")
      thisTable match {
        case None => ev.groupBy("user_id")
          .agg(sum("amount").as("total"), max("ts").as("last_ts"))
        case Some(existing) =>
          // is_incremental(): only events past the stored high-water mark
          val hwm = existing.agg(max("last_ts")).head.getLong(0)
          val newEv = ev.where(col("ts") > hwm)
          // touched users re-aggregate new rows + their prior totals
          val prior = existing.join(
            newEv.select("user_id").distinct(), Seq("user_id"), "left_semi")
          newEv.groupBy("user_id")
            .agg(sum("amount").as("new_amt"), max("ts").as("new_ts"))
            .join(prior, Seq("user_id"), "left")
            .select(col("user_id"),
              (coalesce(col("total"), lit(0L)) + col("new_amt")).as("total"),
              greatest(col("new_ts"), coalesce(col("last_ts"), col("new_ts")))
                .as("last_ts"))
      }
    })))

  private def events(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "amount", "ts")

  test("first run full-builds; later runs merge only the delta") {
    val catalog = new LakeCatalog(tmpDir("inc_model"))
    val cat = Some((catalog, "wh", "marts"))

    graph.run(spark, Map("events" -> events((1L, 10L, 1L), (2L, 5L, 2L))),
      catalog = cat)
    val t = catalog.loadTable(spark, "wh", "marts", "user_totals")
    assert(t.read().orderBy("user_id").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L), (2L, 5L)))
    val v1Files = t.metadata.currentSnapshot.get.paths.toSet

    // second run: one new event for user 2, one brand-new user 3 — the
    // full source includes the old rows, but the model only reads past
    // the high-water mark, so user 1's total must come from the MERGE
    // carrying its file, not from recomputation
    graph.run(spark, Map("events" -> events(
      (1L, 10L, 1L), (2L, 5L, 2L), (2L, 7L, 3L), (3L, 2L, 4L))), catalog = cat)
    val t2 = catalog.loadTable(spark, "wh", "marts", "user_totals")
    assert(t2.read().orderBy("user_id").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 12L), (3L, 2L)))
    // incremental, not a rebuild: a merge commit on top of the history
    assert(t2.metadata.snapshots.map(_.operation).last == "merge")

    // no-delta run is a no-op on the contents
    graph.run(spark, Map("events" -> events(
      (1L, 10L, 1L), (2L, 5L, 2L), (2L, 7L, 3L), (3L, 2L, 4L))), catalog = cat)
    val t3 = catalog.loadTable(spark, "wh", "marts", "user_totals")
    assert(t3.read().count() == 3)

    // --full-refresh rebuilds from scratch (replace, not merge)
    graph.run(spark, Map("events" -> events((9L, 1L, 9L))), catalog = cat,
      fullRefresh = true)
    val t4 = catalog.loadTable(spark, "wh", "marts", "user_totals")
    assert(t4.read().collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(t4.metadata.snapshots.map(_.operation).last == "replace")
    assert(v1Files.nonEmpty) // sanity: the first build did write files
  }

  test("incremental merge evolves the schema when the delta carries a new column") {
    // The reference e2e pins evolution (test_evolve_schema_new_columns) and
    // dbt pins incremental runs; this is the COMBINATION: a column appears
    // mid-incremental-run. The merge must add-only evolve the target, the
    // untouched rows read back null for the new column, and --full-refresh
    // keeps working on the evolved table.
    val catalog = new LakeCatalog(tmpDir("inc_evolve"))
    val cat = Some((catalog, "wh", "marts"))
    val g = new ModelGraph(Seq(Model(
      name = "totals_ev",
      deps = Seq("events"),
      build = (_, r) => r("events"),
      materialized = "incremental",
      uniqueKey = Seq("user_id"),
      incrementalBuild = Some { (_, r, thisTable) =>
        val ev = r("events")
        thisTable match {
          case None => ev
          case Some(existing) =>
            val hwm = existing.agg(max("last_ts")).head.getLong(0)
            ev.where(col("last_ts") > hwm)
        }
      })))

    // first run: the source has no 'region' column yet
    g.run(spark, Map("events" ->
      Seq((1L, 10L, 1L), (2L, 5L, 2L)).toDF("user_id", "total", "last_ts")),
      catalog = cat)
    val t1 = catalog.loadTable(spark, "wh", "marts", "totals_ev")
    assert(!t1.read().schema.fieldNames.contains("region"))

    // second run: the delta carries a brand-new 'region' column
    g.run(spark, Map("events" -> Seq(
      (1L, 10L, 1L, "ignored"), (2L, 12L, 3L, "eu"), (3L, 2L, 4L, "us"))
      .toDF("user_id", "total", "last_ts", "region")), catalog = cat)
    val t2 = catalog.loadTable(spark, "wh", "marts", "totals_ev")
    val rows = t2.read().orderBy("user_id").collect().map(r =>
      (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("total")),
        Option(r.getAs[String]("region")))).toSeq
    // user 1 pre-dates the column: null-filled, total untouched; 2 merged,
    // 3 inserted — and the commit is a merge on the evolved schema, not a
    // rebuild
    assert(rows == Seq((1L, 10L, None), (2L, 12L, Some("eu")),
      (3L, 2L, Some("us"))))
    assert(t2.metadata.snapshots.map(_.operation).last == "merge")
    assert(t2.metadata.schema.fieldNames.contains("region"))

    // --full-refresh on the evolved table still replaces cleanly
    g.run(spark, Map("events" ->
      Seq((9L, 1L, 9L, "apac")).toDF("user_id", "total", "last_ts", "region")),
      catalog = cat, fullRefresh = true)
    val t3 = catalog.loadTable(spark, "wh", "marts", "totals_ev")
    assert(t3.read().collect().map(r =>
      (r.getLong(r.fieldIndex("user_id")), r.getAs[String]("region"))).toSeq ==
      Seq((9L, "apac")))
    assert(t3.metadata.snapshots.map(_.operation).last == "replace")
  }

  test("incremental without incrementalBuild fails clearly") {
    val g = new ModelGraph(Seq(Model("m", Nil, (_, _) => events((1L, 1L, 1L)),
      materialized = "incremental")))
    val catalog = new LakeCatalog(tmpDir("inc_bad"))
    val e = intercept[IllegalStateException] {
      g.run(spark, Map.empty, catalog = Some((catalog, "wh", "ns")))
    }
    assert(e.getMessage.contains("incrementalBuild"))
  }

  test("incremental without a catalog fails instead of view-rebuilding") {
    val g = new ModelGraph(Seq(Model("m", Nil, (_, _) => events((1L, 1L, 1L)),
      materialized = "incremental",
      incrementalBuild = Some((_, _, _) => events((1L, 1L, 1L))))))
    val e = intercept[IllegalStateException] {
      g.run(spark, Map.empty, catalog = None)
    }
    assert(e.getMessage.contains("no catalog"))
  }
}
