package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Multimodal plumbing: binary payload + typed metadata; decode is a
  * deterministic stub, the Spark-side contracts are real. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, Array[Byte](0, 1, 2, 3, 120.toByte),
        Row("image", "png", 64, 48, null)),
      Row(2L, null, Row("image", "png", 8, 8, null)),
      Row(3L, Array[Byte](5, 5, 5), Row("video", "mp4", 320, 240, 2500L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
  }

  test("decodeFeatures: partition-parallel, null payloads dropped, " +
    "deterministic 16-bin features") {
    val out = Multimodal.decodeFeatures(spark, mediaDf).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 3L))
    val f1 = out.head
    assert(f1.n_bytes == 5 && f1.width == 64 && f1.height == 48)
    assert(f1.features.length == 16)
    assert(math.abs(f1.features.sum - 1.0f) < 1e-6) // normalized histogram
    // bytes 0-3 land in bin 0, byte 120 in bin 7
    assert(f1.features(0) == 0.8f && f1.features(7) == 0.2f)
    // deterministic across invocations
    val again = Multimodal.decodeFeatures(spark, mediaDf).collect().sortBy(_.media_id)
    assert(again.head.features.toSeq == f1.features.toSeq)
  }

  test("withResizeTarget rewrites metadata, preserves payload") {
    val resized = Multimodal.withResizeTarget(mediaDf, 32, 32)
    val m = resized.where(col("media_id") === 1)
      .select("meta.width", "meta.height").collect().head
    assert(m == Row(32, 32))
    // same field names/types (literal width/height tighten nullability)
    val dt = resized.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(dt.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.MediaMetadataType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("sampleFrames explodes video rows into evenly spaced frame stamps") {
    val frames = Multimodal.sampleFrames(mediaDf, everyMs = 1000)
    val stamps = frames.where(col("media_id") === 3)
      .select("frame_ts_ms").collect().map(_.getLong(0)).sorted
    assert(stamps.toSeq == Seq(0L, 1000L, 2000L))
    // image rows produce no frames
    assert(frames.where(col("media_id") === 1).count() == 0)
  }
}
