package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** AvroShard: hand-rolled Avro OCF codec. The independence anchor is
  * `org.apache.avro` (the reference implementation, on Spark's provided
  * classpath): our writer's shards must parse under their reader and
  * their writer's shards under our reader — the ImageIO/javax.sound
  * cross-validation stance applied to the container family. */
class AvroShardSpec extends AnyFunSuite with SparkSpec {

  private val contract = StructType(Seq(
    StructField("rid", LongType), StructField("name", StringType),
    StructField("score", DoubleType), StructField("ok", BooleanType),
    StructField("tags", ArrayType(LongType))))

  private def mkRows(n: Int): Seq[Row] = (0 until n).map { i =>
    Row(i.toLong * 3, s"n$i", i * 0.5, i % 2 == 0,
      Seq(i.toLong, i.toLong + 1))
  }

  // ---- round trip through our own writer+reader ---------------------------

  test("round-trips records through deflate and null codecs") {
    for (codec <- Seq("null", "deflate")) {
      val rows = mkRows(10)
      val payload = AvroShard.encodeShard(rows.iterator, contract, 7L,
        codec = codec, blockRows = 3) // forces multi-block
      val got = AvroShard.parseShardAs(7L, payload, contract)
      assert(got.size == 10)
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) == 7L && r.getLong(1) == i.toLong)
        assert(r.getLong(2) == i.toLong * 3)
        assert(r.getString(3) == s"n$i")
        assert(r.getDouble(4) == i * 0.5)
        assert(r.getBoolean(5) == (i % 2 == 0))
        assert(r.getSeq[Long](6) == Seq(i.toLong, i.toLong + 1))
      }
    }
  }

  test("null field values survive the writer union") {
    val rows = Seq(Row(1L, null, 0.5, true, null),
      Row(2L, "x", null, null, Seq(9L)))
    val payload = AvroShard.encodeShard(rows.iterator, contract, 1L)
    val got = AvroShard.parseShardAs(1L, payload, contract)
    assert(got.size == 2)
    assert(got(0).isNullAt(3) && got(0).isNullAt(6))
    assert(got(1).isNullAt(4) && got(1).isNullAt(5))
    assert(got(1).getSeq[Long](6) == Seq(9L))
  }

  test("contract projection ignores extra file columns and widens int/float") {
    // file schema: (a int, b float, extra string); contract: (a long, b double)
    val fileSchema = StructType(Seq(StructField("a", IntegerType),
      StructField("b", FloatType), StructField("extra", StringType)))
    val rows = Seq(Row(4, 1.5f, "zzz"), Row(-9, 2.25f, "w"))
    val payload = AvroShard.encodeShard(rows.iterator, fileSchema, 2L)
    val want = StructType(Seq(StructField("b", DoubleType),
      StructField("a", LongType)))
    val got = AvroShard.parseShardAs(2L, payload, want)
    assert(got.map(r => (r.getDouble(2), r.getLong(3))) ==
      Seq((1.5, 4L), (2.25, -9L)))
  }

  test("missing or type-incompatible contract column rejects the whole shard") {
    val payload = AvroShard.encodeShard(mkRows(3).iterator, contract, 3L)
    val missing = StructType(Seq(StructField("nope", LongType)))
    assert(AvroShard.parseShardAs(3L, payload, missing).isEmpty)
    val wrongType = StructType(Seq(StructField("name", LongType)))
    assert(AvroShard.parseShardAs(3L, payload, wrongType).isEmpty)
  }

  test("deterministic payloads: same rows, same seed, same bytes") {
    val a = AvroShard.encodeShard(mkRows(5).iterator, contract, 11L)
    val b = AvroShard.encodeShard(mkRows(5).iterator, contract, 11L)
    assert(java.util.Arrays.equals(a, b))
  }

  // ---- failure contract ----------------------------------------------------

  test("bad magic / unsupported schema / unsupported codec reject the shard") {
    val payload = AvroShard.encodeShard(mkRows(3).iterator, contract, 4L)
    val badMagic = payload.clone(); badMagic(0) = 'X'.toByte
    assert(AvroShard.parseShardAs(4L, badMagic, contract).isEmpty)
    assert(AvroShard.parseShardAs(4L, Array[Byte](1, 2), contract).isEmpty)
    assert(AvroShard.parseShardAs(4L, null, contract).isEmpty)
  }

  test("enum / map / nested-record / logicalType schemas are rejected") {
    def rec(fieldType: String) =
      s"""{"type":"record","name":"r","fields":[{"name":"f","type":$fieldType}]}"""
    assert(AvroShard.parseSchemaJson(rec(
      """{"type":"enum","name":"e","symbols":["A"]}""")).isEmpty)
    assert(AvroShard.parseSchemaJson(rec(
      """{"type":"map","values":"long"}""")).isEmpty)
    assert(AvroShard.parseSchemaJson(rec(
      """{"type":"record","name":"inner","fields":[]}""")).isEmpty)
    assert(AvroShard.parseSchemaJson(rec(
      """{"type":"long","logicalType":"timestamp-millis"}""")).isEmpty)
    assert(AvroShard.parseSchemaJson(rec(""""long"""")).nonEmpty)
    assert(AvroShard.parseSchemaJson(rec("""["null","string"]""")).nonEmpty)
    assert(AvroShard.parseSchemaJson(rec("""["string","null"]""")).nonEmpty)
    assert(AvroShard.parseSchemaJson(rec("""["long","string"]""")).isEmpty)
  }

  test("corrupt block body skips that block's rows, keeps the rest") {
    // null codec so a data flip stays inside one block's datum stream
    val payload = AvroShard.encodeShard(mkRows(9).iterator, contract, 5L,
      codec = "null", blockRows = 3)
    // find block 2's data region: walk header (magic+meta+sync), then
    // block1; flip a byte in the SECOND block's string length area.
    // Cheaper and robust: flip a byte at a position that provably sits
    // inside the middle third of the payload body after the header.
    // Instead we corrupt via the deflate codec: a flipped byte inside a
    // deflate stream fails inflation for exactly that block.
    val zPayload = AvroShard.encodeShard(mkRows(9).iterator, contract, 5L,
      codec = "deflate", blockRows = 3)
    // locate the three block bodies by re-walking: blocks start after
    // header; each is count,size,data,sync. Walk longs minimally here by
    // trusting the reader: corrupt each byte of the payload tail one at
    // a time until exactly one block's rows vanish.
    val base = AvroShard.parseShardAs(5L, zPayload, contract)
    assert(base.size == 9)
    // flip one byte near 2/3 of the body — inside block 2 or 3's data
    val c = zPayload.clone()
    val at = (zPayload.length * 2) / 3
    c(at) = (c(at) ^ 0x5a).toByte
    val got = AvroShard.parseShardAs(5L, c, contract)
    // sync-framing intact for untouched blocks: we keep at least one
    // full block (3 rows) and lose at most two blocks
    assert(got.size < 9 && got.size >= 3)
    // rec_idx of surviving rows is still their true slot
    got.foreach(r => assert(r.getLong(1) == r.getLong(2) / 3))
  }

  test("truncated payload keeps the records before the cut") {
    val payload = AvroShard.encodeShard(mkRows(9).iterator, contract, 6L,
      codec = "null", blockRows = 3)
    val cut = java.util.Arrays.copyOfRange(payload, 0, payload.length - 20)
    val got = AvroShard.parseShardAs(6L, cut, contract)
    assert(got.size >= 3 && got.size < 9)
  }

  test("block bomb guard skips the oversized block but keeps its index slots") {
    val big = Seq(Row(1L, "x" * 3000, 0.0, true, Seq(1L)))
    val small = mkRows(2).map(r => Row(100L + r.getLong(0), r.getString(1),
      r.getDouble(2), r.getBoolean(3), r.getSeq[Long](4)))
    val payload = AvroShard.encodeShard((big ++ small).iterator, contract, 8L,
      codec = "null", blockRows = 1)
    val got = AvroShard.parseShardAs(8L, payload, contract,
      maxBlockBytes = 1024)
    assert(got.size == 2)
    assert(got.map(_.getLong(1)) == Seq(1L, 2L)) // slot 0 is the skipped bomb
  }

  // ---- cross-validation against org.apache.avro ---------------------------

  private def avroLibSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      AvroShard.schemaJson("graft_rec", Seq(
        "rid" -> AvroShard.ALong, "name" -> AvroShard.AString,
        "score" -> AvroShard.ADouble, "ok" -> AvroShard.ABool,
        "tags" -> AvroShard.AArray(AvroShard.ALong))))

  test("our writer's shards parse under the Avro reference reader") {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    for (codec <- Seq("null", "deflate")) {
      val payload = AvroShard.encodeShard(mkRows(7).iterator, contract, 9L,
        codec = codec, blockRows = 2)
      val rdr = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(payload),
        new GenericDatumReader[GenericRecord]())
      try {
        var i = 0
        while (rdr.hasNext) {
          val rec = rdr.next()
          assert(rec.get("rid") == i.toLong * 3)
          assert(rec.get("name").toString == s"n$i")
          assert(rec.get("score") == i * 0.5)
          assert(rec.get("ok") == (i % 2 == 0))
          val tags = rec.get("tags").asInstanceOf[java.util.List[Long]]
          assert(tags.size() == 2 && tags.get(0) == i.toLong)
          i += 1
        }
        assert(i == 7)
      } finally rdr.close()
    }
  }

  test("the Avro reference writer's shards parse under our reader") {
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    for (codec <- Seq(CodecFactory.nullCodec(), CodecFactory.deflateCodec(6))) {
      val schema = avroLibSchema
      val bos = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(codec)
      w.create(schema, bos)
      (0 until 6).foreach { i =>
        val rec = new GenericData.Record(schema)
        rec.put("rid", i.toLong)
        rec.put("name", if (i == 3) null else s"ref$i")
        rec.put("score", i * 1.25)
        rec.put("ok", i % 2 == 1)
        rec.put("tags", java.util.Arrays.asList(
          java.lang.Long.valueOf(i.toLong), java.lang.Long.valueOf(99L)))
        w.append(rec)
      }
      w.close()
      val got = AvroShard.parseShardAs(0L, bos.toByteArray, contract)
      assert(got.size == 6)
      (0 until 6).foreach { i =>
        val r = got(i)
        assert(r.getLong(2) == i.toLong)
        if (i == 3) assert(r.isNullAt(3)) else assert(r.getString(3) == s"ref$i")
        assert(r.getDouble(4) == i * 1.25)
        assert(r.getBoolean(5) == (i % 2 == 1))
        assert(r.getSeq[Long](6) == Seq(i.toLong, 99L))
      }
    }
  }

  // ---- distributed paths ---------------------------------------------------

  test("writeShards + explodeRowsAs round-trip a DataFrame with ordering") {
    import spark.implicits._
    val df = (0 until 40).map { i =>
      (i % 4, i.toLong, s"doc$i", i * 0.25, i % 3 == 0, Seq(i.toLong, 2L * i))
    }.toDF("shard", "rid", "name", "score", "ok", "tags")
    val shards = AvroShard.writeShards(spark, df, "shard", Seq("rid"),
      codec = "deflate", blockRows = 4)
    assert(shards.count() == 4)
    val back = AvroShard.explodeRowsAs(spark, shards, contract)
    assert(back.count() == 40)
    // within-shard rec_idx order equals rid order
    val rows = back.orderBy("shard_id", "rec_idx")
      .select("shard_id", "rec_idx", "rid").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val rids = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(rids.sameElements(rids.sorted))
    }
    val sums = back.agg(sum("rid"), sum("score")).head()
    assert(sums.getLong(0) == (0 until 40).map(_.toLong).sum)
    assert(math.abs(sums.getDouble(1) - (0 until 40).map(_ * 0.25).sum) < 1e-9)
  }

  test("writer rejects unsupported Spark types up front") {
    import spark.implicits._
    val df = Seq((1, Map("a" -> 1L))).toDF("shard", "m")
    intercept[IllegalArgumentException] {
      AvroShard.writeShards(spark, df, "shard", Seq("m"))
    }
  }
}
