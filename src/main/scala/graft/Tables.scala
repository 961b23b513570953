package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  * Every query reads only parquet under its `sfDir` — column-pruned,
  * filter-pushed scans; no paths outside the given directory. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations (Spark reads it only as a long via the legacy conf) and as
    * TIMESTAMP(MICROS, ntz) in others (reads natively as TIMESTAMP_NTZ).
    * Normalize BOTH to the same contract every query depends on: `ts_us` =
    * microseconds since the epoch (bigint, floor — DuckDB's truncation) and
    * `ts` = a proper session-TZ timestamp at micro precision. The session
    * runs in UTC, so NTZ wall time == UTC instant. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long generation
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => // native micros generation (TIMESTAMP or TIMESTAMP_NTZ)
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
          .withColumn("ts_us", expr("unix_micros(ts)"))
    }
  }
}
