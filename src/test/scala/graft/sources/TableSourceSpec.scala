package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.runner.Watermark

/** Ports the chunking / row_limit / watermark / renaming behaviors of the
  * reference's `sources/test_sqldatabase.py:74-226`. */
class TableSourceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def writeFixture(dir: String): Unit =
    (1 to 12).map(i => (i.toLong, s"v$i")).toDF("id", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/items.parquet")

  test("scan streams chunkSize-row chunks covering the table exactly") {
    val dir = tmpDir("ts1")
    writeFixture(dir)
    val src = new TableSource(spark, dir)
    val chunks = src.scan(TableSourceConfig("items", chunkSize = 5,
      watermarkColumn = Some("id")))(None).toSeq
    assert(chunks.map(_.count()).toSeq == Seq(5, 5, 2))
    assert(chunks.flatMap(_.select("id").as[Long].collect()).sorted ==
      (1L to 12L))
  }

  test("row_limit caps the scan before chunking") {
    val dir = tmpDir("ts2")
    writeFixture(dir)
    val src = new TableSource(spark, dir)
    val chunks = src.scan(TableSourceConfig("items", chunkSize = 5,
      rowLimit = Some(7), watermarkColumn = Some("id")))(None).toSeq
    assert(chunks.map(_.count()).sum == 7)
  }

  test("watermark filter is strictly greater and reaches the scan") {
    val dir = tmpDir("ts3")
    writeFixture(dir)
    val src = new TableSource(spark, dir)
    val chunks = src.scan(TableSourceConfig("items",
      watermarkColumn = Some("id")))(Some(Watermark("id", 9L))).toSeq
    assert(chunks.map(_.count()).sum == 3) // 10, 11, 12
    // S2: predicate lands in PushedFilters
    val plan = src.scan(TableSourceConfig("items", watermarkColumn = Some("id")))(
      Some(Watermark("id", 9L))).next().queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,9)"))
  }

  test("query adapter rewrites the scan (S3) and destination renames (S1)") {
    val dir = tmpDir("ts4")
    writeFixture(dir)
    val src = new TableSource(spark, dir)
    val cfg = TableSourceConfig("items", destination = Some("renamed_items"),
      queryAdapter = df => df.where(col("id") % 2 === 0)
        .withColumn("doubled", col("id") * 2),
      watermarkColumn = Some("id"))
    val res = src.resource(cfg)
    assert(res.name == "renamed_items")
    val rows = res.extractor(None).toSeq.map(_.select("id", "doubled")
      .as[(Long, Long)].collect().toSeq).flatten.sorted
    assert(rows == Seq((2L, 4L), (4L, 8L), (6L, 12L), (8L, 16L), (10L, 20L), (12L, 24L)))
  }
}
