package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ArrowShardSpec extends AnyFunSuite with SparkSpec {

  private val rows = Seq(
    (10L, "alpha", 1.25), (11L, "beta", -2.5), (12L, "gamma", 0.0),
    (13L, "delta", 3.75), (14L, "epsilon", 100.125))

  test("round-trips across record-batch boundaries") {
    for (batchRows <- Seq(1, 2, 4, 100)) {
      val bytes = ArrowShard.encodeShard(rows, batchRows)
      val out = ArrowShard.parseShard(7L, bytes)
      assert(out.map(r => (r.rec_id, r.label, r.value)) == rows,
        s"batchRows=$batchRows")
      assert(out.map(_.row_idx) == (0L until rows.length).toSeq)
      assert(out.forall(_.shard_id == 7L))
    }
  }

  test("schema-contract violations and malformed bytes reject the shard quietly") {
    assert(ArrowShard.parseShard(1L, Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(ArrowShard.parseShard(1L, Array.empty[Byte]).isEmpty)
    val good = ArrowShard.encodeShard(rows)
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 100) {
      val bad = good.clone()
      val at = rnd.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 << rnd.nextInt(8))).toByte
      ArrowShard.parseShard(1L, bad) // no throw, no leak (allocator closes)
    }
    for (cut <- 0 until good.length by 17) ArrowShard.parseShard(1L, good.take(cut))
  }

  private val typedRows = Seq(
    (1, "red", 1.5f, true, Seq(1L, 2L, 3L)),
    (2, "blue", -0.25f, false, Seq.empty[Long]),
    (3, "red", 7.0f, true, Seq(42L)),
    (4, "green", 0.0f, false, Seq(-1L, -2L)))

  private val typedSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("rid",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("score",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("flags",
      org.apache.spark.sql.types.BooleanType),
    org.apache.spark.sql.types.StructField("tags",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType))))

  test("schema-driven read: plain and dictionary-encoded shards, with " +
       "int32->long and float4->double widening") {
    for (dict <- Seq(false, true)) {
      val bytes = ArrowShard.encodeTypedShard(typedRows, dictEncodeName = dict)
      val out = ArrowShard.parseShardAs(5L, bytes, typedSchema)
      assert(out.length == typedRows.length, s"dict=$dict")
      out.zip(typedRows).zipWithIndex.foreach { case ((r, (rid, nm, sc, fl, tg)), i) =>
        assert(r.getLong(0) == 5L && r.getLong(1) == i.toLong)
        assert(r.getLong(2) == rid.toLong, s"dict=$dict rid")
        assert(r.getString(3) == nm, s"dict=$dict name")
        assert(r.getDouble(4) == sc.toDouble, s"dict=$dict score")
        assert(r.getBoolean(5) == fl, s"dict=$dict flags")
        assert(r.getSeq[Long](6) == tg, s"dict=$dict tags")
      }
    }
  }

  test("schema-driven read: column subset + reordering is the contract, " +
       "missing or mistyped columns reject the shard") {
    val bytes = ArrowShard.encodeTypedShard(typedRows, dictEncodeName = true)
    import org.apache.spark.sql.types._
    // subset, reordered
    val sub = StructType(Seq(StructField("name", StringType),
      StructField("rid", LongType)))
    val out = ArrowShard.parseShardAs(1L, bytes, sub)
    assert(out.map(r => (r.getString(2), r.getLong(3))) ==
      typedRows.map(t => (t._2, t._1.toLong)))
    // missing column
    assert(ArrowShard.parseShardAs(1L, bytes, StructType(Seq(
      StructField("nope", LongType)))).isEmpty)
    // mistyped: narrowing long<-float4 is not an accepted pair
    assert(ArrowShard.parseShardAs(1L, bytes, StructType(Seq(
      StructField("score", LongType)))).isEmpty)
    // mistyped list element
    assert(ArrowShard.parseShardAs(1L, bytes, StructType(Seq(
      StructField("tags", ArrayType(StringType))))).isEmpty)
    // dictionary column demanded as a non-string type
    assert(ArrowShard.parseShardAs(1L, bytes, StructType(Seq(
      StructField("name", LongType)))).isEmpty)
  }

  test("schema-driven read: bit-flip fuzz never throws") {
    val good = ArrowShard.encodeTypedShard(typedRows, dictEncodeName = true)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 100) {
      val bad = good.clone()
      val at = rnd.nextInt(bad.length)
      bad(at) = (bad(at) ^ (1 << rnd.nextInt(8))).toByte
      ArrowShard.parseShardAs(1L, bad, typedSchema)
    }
    for (cut <- 0 until good.length by 17)
      ArrowShard.parseShardAs(1L, good.take(cut), typedSchema)
  }

  test("schema-driven distributed explode materializes typed columns") {
    val shards = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L,
          ArrowShard.encodeTypedShard(typedRows.take(2), dictEncodeName = false)),
        org.apache.spark.sql.Row(2L,
          ArrowShard.encodeTypedShard(typedRows.drop(2), dictEncodeName = true)),
        org.apache.spark.sql.Row(3L, Array[Byte](9, 9, 9)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val out = ArrowShard.explodeRowsAs(spark, shards, typedSchema)
    assert(out.columns.toSeq ==
      Seq("shard_id", "row_idx", "rid", "name", "score", "flags", "tags"))
    val rows = out.orderBy("shard_id", "row_idx").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 1L, 2L, 2L))
    assert(rows.map(_.getString(3)).toSeq == Seq("red", "blue", "red", "green"))
  }

  test("distributed explode emits every row of every shard") {
    import spark.implicits._
    val shards = Seq(
      (1L, ArrowShard.encodeShard(rows.take(2))),
      (2L, ArrowShard.encodeShard(rows.drop(2), batchRows = 1)),
      (3L, Array[Byte](9, 9, 9))).toDF("shard_id", "payload")
    val out = ArrowShard.explodeRows(spark, shards).collect()
    assert(out.count(_.shard_id == 1L) == 2)
    assert(out.count(_.shard_id == 2L) == 3)
    assert(!out.exists(_.shard_id == 3L))
  }
}
