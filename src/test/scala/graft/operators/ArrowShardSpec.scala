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
