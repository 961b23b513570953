package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.runner.{Resource, ResourceWriteProperties}

/** The statusdisplay ingest pipeline (S4,
  * `warehouses/facility_ops_landing/ingest/accelerator/statusdisplay/statusdisplay.py:20-41`
  * + `.dlt/config.toml`): a REST API source reading the `cycles` resource
  * from the ISIS status API with write_disposition=replace, normalized by
  * dlt into a `cycles` parent table and a `cycles__phases` child table.
  *
  * The HTTP GET is replaced by canned JSON response files in the source
  * directory (the sandbox has no egress; a real deployment points the same
  * reader at the response body fetched via [[FileSources.withRetry]]).
  * The schema is declared, not inferred — one less planning pass and no
  * drift between runs.
  */
final class StatusDisplaySource(spark: SparkSession, sourceDir: String) {

  /** Response element shape of `GET /api/cycles`: a cycle label plus its
    * phase windows. */
  val CycleSchema: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("phases", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("target", IntegerType),
      StructField("start", TimestampType),
      StructField("end", TimestampType)))))))

  def readCycles(): (DataFrame, Map[String, DataFrame]) = {
    val raw = spark.read.schema(CycleSchema)
      .option("multiLine", "true")
      .json(s"$sourceDir/cycles.json")
    JsonNormalizer.normalize("cycles", raw)
  }

  def resources: Seq[Resource] = {
    // normalize() is lazy (plans, no jobs); both resources share the parse
    lazy val (parent, children) = readCycles()
    Seq(
      Resource("cycles", _ => Iterator(parent),
        ResourceWriteProperties(writeMode = "replace"), dltColumns = true),
      Resource("cycles__phases", _ => Iterator(children("cycles__phases")),
        ResourceWriteProperties(writeMode = "replace"), dltColumns = true))
  }
}
