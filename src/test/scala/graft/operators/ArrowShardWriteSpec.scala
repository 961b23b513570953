package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The writer half of the Arrow container family (VERDICT r9 ask #6):
  * [[ArrowShard.writeShards]] / [[ArrowShard.encodeRows]] must produce
  * REAL Arrow IPC files — verified by round-tripping through the repo's
  * own schema-driven reader AND by a byte-level check of the IPC file
  * layout (pyarrow is not available in this container, so the format
  * spec itself is the independent witness: magic framing, footer length
  * field, continuation marker). */
class ArrowShardWriteSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("rec_id", LongType), StructField("label", StringType),
    StructField("value", DoubleType)))

  private def mkRows(n: Int): Seq[Row] =
    (0 until n).map(i => Row(i.toLong, s"l${i % 3}", i * 0.5))

  test("encodeRows round-trips through the schema-driven reader, multi-batch") {
    val bytes = ArrowShard.encodeRows(mkRows(10).iterator, schema, batchRows = 3)
    val back = ArrowShard.parseShardAs(7L, bytes, schema)
    assert(back.length == 10)
    assert(back.map(_.getLong(2)) == (0L until 10L))
    assert(back.map(_.getString(3)) == (0 until 10).map(i => s"l${i % 3}"))
    assert(back.map(_.getDouble(4)) == (0 until 10).map(_ * 0.5))
    // row_idx is batch-boundary-exact across the 4 batches (3+3+3+1)
    assert(back.map(_.getLong(1)) == (0L until 10L))
  }

  test("byte-level Arrow IPC file layout: magic framing, footer, continuation") {
    val bytes = ArrowShard.encodeRows(mkRows(5).iterator, schema, batchRows = 2)
    val magic = "ARROW1".getBytes("UTF-8")
    // header: magic + 2 bytes padding to 8-byte alignment
    assert(bytes.slice(0, 6).sameElements(magic), "missing header magic")
    assert(bytes(6) == 0 && bytes(7) == 0, "header magic not padded")
    // trailer: ...footerLength(int32 LE) + magic
    assert(bytes.slice(bytes.length - 6, bytes.length).sameElements(magic),
      "missing trailer magic")
    val fl = java.nio.ByteBuffer.wrap(bytes, bytes.length - 10, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(fl > 0 && fl < bytes.length, s"implausible footer length $fl")
    // the footer flatbuffer sits immediately before its length field
    assert(bytes.length - 10 - fl >= 8, "footer overlaps header")
    // first message after the header starts with the IPC continuation
    // marker 0xFFFFFFFF (Arrow >= 0.15 encapsulated message format)
    val cont = java.nio.ByteBuffer.wrap(bytes, 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(cont == -1, f"expected continuation marker, got 0x$cont%08x")
  }

  test("null cells, list columns and empty input survive the round trip") {
    val s2 = StructType(Seq(
      StructField("id", LongType), StructField("tags", ArrayType(LongType)),
      StructField("name", StringType)))
    val rows = Seq(
      Row(1L, Seq(10L, 20L), "a"),
      Row(2L, null, null),
      Row(3L, Seq.empty[Long], "c"))
    val bytes = ArrowShard.encodeRows(rows.iterator, s2, batchRows = 2)
    val back = ArrowShard.parseShardAs(0L, bytes, s2)
    assert(back.length == 3)
    assert(back(0).getSeq[Long](3) == Seq(10L, 20L))
    assert(back(1).get(3) == null && back(1).get(4) == null)
    assert(back(2).getSeq[Long](3) == Seq.empty)
    // empty input -> a valid zero-batch file, zero rows, no throw
    val empty = ArrowShard.encodeRows(Iterator.empty, s2, batchRows = 4)
    assert(ArrowShard.parseShardAs(0L, empty, s2).isEmpty)
    assert(empty.slice(0, 6).sameElements("ARROW1".getBytes("UTF-8")))
  }

  test("unsupported writer column types are rejected on the driver") {
    val bad = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    intercept[IllegalArgumentException] {
      ArrowShard.encodeRows(Iterator.empty, bad, batchRows = 4)
    }
  }

  test("writeShards: one file per shard, deterministic order, distributed round trip") {
    import spark.implicits._
    val df = (0L until 40L).toDF("doc_id").select(
      (col("doc_id") % 4).as("shard"), col("doc_id"),
      concat(lit("n"), (col("doc_id") % 5).cast("string")).as("name"))
    val shards = ArrowShard.writeShards(spark, df, "shard", Seq("doc_id"),
      batchRows = 3).collect()
    assert(shards.length == 4)
    assert(shards.map(_.getLong(1)).sum == 40L)
    val contract = StructType(Seq(
      StructField("doc_id", LongType), StructField("name", StringType)))
    val back = ArrowShard.explodeRowsAs(spark,
      ArrowShard.writeShards(spark, df, "shard", Seq("doc_id"), batchRows = 3),
      contract)
    assert(back.count() == 40)
    // within-shard order is doc_id ascending -> row_idx equals the rank
    val mismatch = back.select(col("shard_id"), col("row_idx"), col("doc_id"))
      .where(col("doc_id") =!= col("shard_id") + col("row_idx") * 4)
      .count()
    assert(mismatch == 0)
  }

  test("a corrupted written payload yields no rows and no allocator leak growth") {
    val bytes = ArrowShard.encodeRows(mkRows(8).iterator, schema, batchRows = 3)
    val before = ArrowShard.allocatorLeakReports.get()
    for (cut <- Seq(bytes.length / 2, bytes.length - 7)) {
      val truncated = bytes.take(cut)
      assert(ArrowShard.parseShardAs(0L, truncated, schema).isEmpty)
    }
    val flipped = bytes.clone()
    flipped(bytes.length / 3) = (flipped(bytes.length / 3) ^ 0x5A).toByte
    // bit flips may or may not break parsing, but must never throw
    ArrowShard.parseShardAs(0L, flipped, schema)
    assert(ArrowShard.allocatorLeakReports.get() == before,
      "writer-produced corrupt payloads should close cleanly")
  }
}
