package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-parallel batch
  * functions over the binary payloads.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[stubDecode]] derives a deterministic fake raster from the
  * payload bytes + declared metadata, so every downstream contract — schema,
  * batch shape, partitioning, null handling — is real and tested, and a real
  * decoder can be swapped in behind the same signature.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val MediaMetadataType: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("format", StringType, nullable = false), // png|jpeg|wav|mp4|...
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Canonical multimodal record schema: id + payload + metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MediaMetadataType, nullable = false)))

  final case class DecodedFeatures(media_id: Long, width: Int, height: Int,
                                   n_bytes: Long, features: Array[Float])

  /** Deterministic fake decode: features are a normalized byte histogram of
    * the payload (16 bins). A real implementation would decode the raster
    * and pool pixels; contract (one row in -> one row out, null payloads
    * dropped) is identical. */
  def stubDecode(mediaId: Long, payload: Array[Byte],
                 width: Int, height: Int): DecodedFeatures = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) / 16) += 1f; i += 1 }
    val n = math.max(1, payload.length).toFloat
    DecodedFeatures(mediaId, width, height, payload.length.toLong,
      hist.map(_ / n))
  }

  /** Partition-parallel decode + feature extraction over the binary column
    * (the Scala shape of a pandas-UDF `mapInPandas` batch fn). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media
      .where(col("payload").isNotNull)
      .select(col("media_id"), col("payload"),
        coalesce(col("meta.width"), lit(0)).as("w"),
        coalesce(col("meta.height"), lit(0)).as("h"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, bytes, w, h) => stubDecode(id, bytes, w, h) })
  }

  /** Resize plumbing: records the target size in metadata and delegates the
    * pixel work to the (stubbed) codec — payload passes through unchanged
    * here, a real decoder would re-encode. */
  def withResizeTarget(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.media_type"), col("meta.format"),
        lit(w).as("width"), lit(h).as("height"), col("meta.duration_ms")))

  /** Frame sampling for video rows: one output row per sampled frame index,
    * evenly spaced across the declared duration. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.where(col("meta.media_type") === "video" && col("meta.duration_ms").isNotNull)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"), col("payload"), col("meta"))
}
