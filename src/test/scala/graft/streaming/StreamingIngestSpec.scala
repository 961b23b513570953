package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tables.LakeTable

/** §2.9: AvailableNow streaming ingest — two drains pick up exactly the new
  * files (checkpointed offsets = the watermark-cursor equivalent). */
class StreamingIngestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("drainToTable ingests only newly arrived files per drain") {
    val src = tmpDir("stream_src")
    val tableLoc = tmpDir("stream_tbl") + "/t"
    val ckpt = tmpDir("stream_ckpt")
    val schema = Seq((1L, "a")).toDF("id", "name").schema

    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(src)
    StreamingIngest.drainToTable(spark, src, schema, tableLoc, ckpt)
    assert(LakeTable.load(spark, tableLoc).read().count() == 2)

    // second batch of files arrives; a new drain appends only those
    Seq((3L, "c")).toDF("id", "name").write.mode("append").parquet(src)
    StreamingIngest.drainToTable(spark, src, schema, tableLoc, ckpt)
    val out = LakeTable.load(spark, tableLoc).read()
    assert(out.count() == 3)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))

    // a third drain with nothing new is a no-op (no duplicate rows)
    StreamingIngest.drainToTable(spark, src, schema, tableLoc, ckpt)
    assert(LakeTable.load(spark, tableLoc).read().count() == 3)
  }

  test("merge-mode drain is a streaming CDC upsert through copy-on-write") {
    val src = tmpDir("cdc_src")
    val tableLoc = tmpDir("cdc_tbl") + "/t"
    val ckpt = tmpDir("cdc_ckpt")
    val schema = Seq((1L, "a")).toDF("id", "name").schema

    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(src)
    StreamingIngest.drainToTable(spark, src, schema, tableLoc, ckpt,
      writeMode = "merge", mergeOn = Seq("id"))
    assert(LakeTable.load(spark, tableLoc).read().count() == 3)

    // a CDC batch updates one key and inserts another: upsert, not append
    Seq((2L, "B2"), (4L, "d")).toDF("id", "name")
      .coalesce(1).write.mode("append").parquet(src)
    StreamingIngest.drainToTable(spark, src, schema, tableLoc, ckpt,
      writeMode = "merge", mergeOn = Seq("id"))
    val out = LakeTable.load(spark, tableLoc).read().as[(Long, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
    assert(LakeTable.load(spark, tableLoc).metadata
      .currentSnapshot.get.operation == "merge")
    // bad configs rejected up front
    intercept[IllegalArgumentException](StreamingIngest.drainToTable(
      spark, src, schema, tableLoc, ckpt, writeMode = "merge"))
    intercept[IllegalArgumentException](StreamingIngest.drainToTable(
      spark, src, schema, tableLoc, ckpt, writeMode = "replace"))
  }

  test("dedupWithinWatermark drops in-window duplicates with bounded state") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = StreamingIngest.dedupWithinWatermark(
      input.toDF().toDF("id", "ts", "payload"), "ts", "10 minutes", Seq("id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData((1L, ts("2024-01-01 00:00:00"), "first"),
        (1L, ts("2024-01-01 00:01:00"), "dup"),
        (2L, ts("2024-01-01 00:02:00"), "other"))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 00:03:00"), "still dup"))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 2) // one row per key inside the window
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("windowedCounts aggregates tumbling windows with a watermark") {
    val events = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 00:50:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), "view", 3.0))
      .toDF("ts", "event_type", "value")
    val out = StreamingIngest.windowedCounts(events, "ts", "1 hour", "10 minutes")
      .orderBy("window_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("cnt") == 2) // two clicks in hour 0
    assert(out(1).getAs[String]("event_type") == "view")
  }
}
