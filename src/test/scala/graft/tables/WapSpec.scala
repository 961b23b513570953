package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish (Iceberg's WAP workflow) over the lake commit
  * protocol: staged snapshots land durably without moving the current
  * pointer, audit reads them by id, publish is one atomic pointer swap
  * that refuses when the base moved, discard drops the stage. */
class WapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshTable(rows: Seq[(Long, String)]): LakeTable = {
    val loc = tmpDir("graft_wap") + "/t"
    val df = rows.toDF("id", "v")
    val t = LakeTable.ensure(spark, loc, df.schema)
    t.write(df, "append")
    t
  }

  test("stage is invisible to readers; audit sees base + delta; publish swaps") {
    val t = freshTable(Seq(1L -> "a", 2L -> "b"))
    val staged = t.stageAppend(Seq(3L -> "c", 4L -> "d").toDF("id", "v"))
    // readers still see the pre-stage table
    assert(t.read().count() == 2)
    // the auditor reads the staged state by id
    val audit = t.readAt(staged).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(audit == Seq(1L, 2L, 3L, 4L))
    // publish = one pointer swap; no data rewrite
    t.publishStaged(staged)
    assert(t.read().count() == 4)
    assert(t.metadata.currentSnapshotId == staged)
  }

  test("publish refuses when the table advanced past the stage's base") {
    val t = freshTable(Seq(1L -> "a"))
    val staged = t.stageAppend(Seq(2L -> "b").toDF("id", "v"))
    // an interleaved commit moves the base
    t.write(Seq(9L -> "z").toDF("id", "v"), "append")
    val e = intercept[Exception](t.publishStaged(staged))
    assert(e.getMessage.contains("re-stage"), e.getMessage)
    // the audited-but-unpublishable stage can be discarded; table intact
    t.discardStaged(staged)
    assert(t.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 9L))
    assert(!t.metadata.snapshots.exists(_.id == staged))
  }

  test("snapshot ids stay unique with a stage in flight") {
    val t = freshTable(Seq(1L -> "a"))
    val staged = t.stageAppend(Seq(2L -> "b").toDF("id", "v"))
    t.write(Seq(3L -> "c").toDF("id", "v"), "append")
    val ids = t.metadata.snapshots.map(_.id)
    assert(ids.distinct.size == ids.size, s"duplicate snapshot ids: $ids")
    // the regular append skipped OVER the staged id
    assert(t.metadata.currentSnapshotId > staged)
  }

  test("discard rejects published and non-WAP snapshots") {
    val t = freshTable(Seq(1L -> "a"))
    val staged = t.stageAppend(Seq(2L -> "b").toDF("id", "v"))
    t.publishStaged(staged)
    val e1 = intercept[IllegalArgumentException](t.discardStaged(staged))
    assert(e1.getMessage.contains("published"), e1.getMessage)
    val first = t.metadata.snapshots.head.id
    val e2 = intercept[IllegalArgumentException](t.discardStaged(first))
    assert(e2.getMessage.contains("not a staged"), e2.getMessage)
  }

  test("WAP drives through SQL: CALL lake.system.publish_staged") {
    val root = tmpDir("graft_wap_sql")
    if (!spark.conf.getOption("spark.sql.catalog.wapcat").isDefined) {
      spark.conf.set("spark.sql.catalog.wapcat", "graft.sql.LakeSparkCatalog")
      spark.conf.set("spark.sql.catalog.wapcat.root", root)
    }
    val catRoot = spark.conf.get("spark.sql.catalog.wapcat.root")
    val df = Seq(1L -> "a").toDF("id", "v")
    val t = LakeTable.ensure(spark, s"$catRoot/nsw/w", df.schema)
    t.write(df, "append")
    val staged = t.stageAppend(Seq(2L -> "b").toDF("id", "v"))
    assert(spark.sql("SELECT count(*) FROM wapcat.nsw.w").head.getLong(0) == 1)
    spark.sql(s"CALL wapcat.system.publish_staged('nsw.w', ${staged}L)")
    assert(spark.sql("SELECT count(*) FROM wapcat.nsw.w").head.getLong(0) == 2)
    val s2 = t.stageAppend(Seq(3L -> "c").toDF("id", "v"))
    spark.sql(s"CALL wapcat.system.discard_staged('nsw.w', ${s2}L)")
    assert(!LakeTable.load(spark, s"$catRoot/nsw/w")
      .metadata.snapshots.exists(_.id == s2))
  }

  test("a published stage stays undiscardable after later commits supersede it") {
    val t = freshTable(Seq(1L -> "a"))
    val staged = t.stageAppend(Seq(2L -> "b").toDF("id", "v"))
    t.publishStaged(staged)
    // a later commit moves the pointer past the published stage
    t.write(Seq(3L -> "c").toDF("id", "v"), "append")
    assert(t.metadata.currentSnapshotId != staged)
    // publish cleared the staged marker, so the superseded snapshot is
    // committed history — discarding it would delete a rollback target
    val e = intercept[IllegalArgumentException](t.discardStaged(staged))
    assert(e.getMessage.contains("published"), e.getMessage)
    // ... and rollbackTo it still works
    t.rollbackTo(staged)
    assert(t.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
  }

  test("expireSnapshots never expires an unpublished in-flight stage") {
    val t = freshTable(Seq(1L -> "a"))
    val staged = t.stageAppend(Seq(2L -> "b").toDF("id", "v"))
    // an aggressive expiry (everything older than "now") must keep the
    // stage: it has no other reference and is awaiting audit
    t.expireSnapshots(olderThanMs = 0L,
      nowMs = System.currentTimeMillis() + 3600000L)
    assert(t.metadata.snapshots.exists(_.id == staged),
      "in-flight stage was expired")
    // the stage is still auditable and publishable afterwards
    assert(t.readAt(staged).count() == 2)
    t.publishStaged(staged)
    assert(t.read().count() == 2)
    // once published the marker is gone and normal retention applies on
    // the NEXT expiry cycle (current snapshot is always kept)
    val op = t.metadata.snapshots.find(_.id == staged).get.operation
    assert(op.startsWith("wap-published-base-"), op)
  }

  test("two stages on the same base: publishing one invalidates the other") {
    val t = freshTable(Seq(1L -> "a"))
    val s1 = t.stageAppend(Seq(2L -> "b").toDF("id", "v"))
    val s2 = t.stageAppend(Seq(3L -> "c").toDF("id", "v"))
    t.publishStaged(s1)
    // s2's base is no longer current — publishing it would drop s1's rows
    intercept[Exception](t.publishStaged(s2))
    t.discardStaged(s2)
    assert(t.read().orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
  }
}
