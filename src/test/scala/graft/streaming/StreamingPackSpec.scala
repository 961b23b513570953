package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.tables.LakeTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingPackSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def wave(rows: Seq[(Long, Long)], dir: Path, name: String): Unit = {
    val stage = freshDir("pack_wave")
    rows.toDF("doc_id", "n").coalesce(1).write.mode("overwrite")
      .parquet(stage.toString)
    val part = Files.list(stage).iterator()
    var src: Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    Files.move(src, dir.resolve(name))
  }

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id LONG, n LONG")

  private def placements(loc: String): Map[Long, (Long, Long, Long)] =
    LakeTable.load(spark, loc).read().collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("start_offset"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("last_seq"))))
      .toMap

  test("waves continue the stream; replay with a fresh checkpoint re-places identically") {
    val in = freshDir("pack_in")
    val loc = freshDir("pack_tbl").resolve("placed").toString
    val ck = freshDir("pack_ck").toString
    wave(Seq((1L, 6L), (2L, 3L)), in, "w1.parquet")
    StreamingPack.packToTable(spark, in.toString, schema, cap = 8L, loc, ck)
    val after1 = placements(loc)
    assert(after1 == Map(1L -> ((0L, 0L, 0L)), 2L -> ((6L, 0L, 1L))))
    wave(Seq((3L, 5L)), in, "w2.parquet")
    StreamingPack.packToTable(spark, in.toString, schema, cap = 8L, loc, ck)
    val after2 = placements(loc)
    assert(after2(3L) == ((9L, 1L, 1L))) // continues at 6 + 3 = 9
    assert(after2(1L) == after1(1L) && after2(2L) == after1(2L))
    // replay: a FRESH checkpoint re-reads both files as one batch; the
    // base derivation excludes the batch's own keys, so every placement
    // recomputes identically and the merge is a no-op rewrite.
    StreamingPack.packToTable(spark, in.toString, schema, cap = 8L, loc,
      freshDir("pack_ck2").toString)
    assert(placements(loc) == after2)
  }

  test("a second drain with no new files is a no-op") {
    val in = freshDir("pack_in2")
    val loc = freshDir("pack_tbl2").resolve("placed").toString
    val ck = freshDir("pack_ck3").toString
    wave(Seq((10L, 4L), (11L, 0L), (12L, 9L)), in, "w1.parquet")
    StreamingPack.packToTable(spark, in.toString, schema, cap = 4L, loc, ck)
    val first = placements(loc)
    // zero-token doc sits at its offset and spans nothing
    assert(first(11L) == ((4L, 1L, 1L)))
    assert(first(12L) == ((4L, 1L, 3L)))
    StreamingPack.packToTable(spark, in.toString, schema, cap = 4L, loc, ck)
    assert(placements(loc) == first)
  }
}
