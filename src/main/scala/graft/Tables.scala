package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  * Every query reads only parquet under its `sfDir` — column-pruned,
  * filter-pushed scans; no paths outside the given directory. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * Read it as a long (legacy conf) and derive `ts_us` = microseconds since
    * the epoch (floor), matching DuckDB's nanos->micros truncation, plus a
    * proper timestamp column `ts` at micro precision. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
