package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ArrowShard.rebalanceShards]]: skewed input shards must come out as
  * output shards whose row counts differ by at most ONE, with the record
  * multiset preserved exactly and the assignment deterministic (it is a
  * pure function of the global record-id rank). */
class ShardRebalanceSpec extends AnyFunSuite with SparkSpec {

  /** 6 shards with row counts 1, 9, 2, 25, 1, 16 (heavily skewed). */
  private def skewed = {
    import spark.implicits._
    Seq(1, 9, 2, 25, 1, 16).zipWithIndex.map { case (k, i) =>
      val rows = (0 until k).map(r =>
        ((i * 1000 + r).toLong, s"s$i", r * 1.5))
      (i.toLong, ArrowShard.encodeShard(rows, batchRows = 4))
    }.toDF("shard_id", "payload")
  }

  test("output shard sizes differ by at most one; content is preserved") {
    val out = ArrowShard.rebalanceShards(spark, skewed, nShards = 4)
    val back = ArrowShard.explodeRows(spark, out).toDF()
    val sizes = back.groupBy("shard_id").count()
      .collect().map(_.getLong(1)).sorted
    assert(sizes.length == 4)
    assert(sizes.sum == 54)
    assert(sizes.last - sizes.head <= 1, sizes.mkString(","))
    // multiset of records unchanged
    val src = ArrowShard.explodeRows(spark, skewed).toDF()
    val a = src.select("rec_id", "label", "value").collect()
      .map(_.toSeq.mkString(",")).sorted.toSeq
    val b = back.select("rec_id", "label", "value").collect()
      .map(_.toSeq.mkString(",")).sorted.toSeq
    assert(a == b)
    // within-shard order is global rank order: rec_ids ascend with
    // (shard_id, row_idx)
    val ordered = back.orderBy("shard_id", "row_idx")
      .select("rec_id").collect().map(_.getLong(0)).toSeq
    assert(ordered == ordered.sorted)
  }

  test("assignment is deterministic across runs and partitionings") {
    def run(parts: String): Seq[String] = {
      val key = "spark.sql.shuffle.partitions"
      val saved = spark.conf.get(key)
      try {
        spark.conf.set(key, parts)
        ArrowShard.explodeRows(spark,
            ArrowShard.rebalanceShards(spark, skewed, nShards = 4)).toDF()
          .orderBy("shard_id", "row_idx")
          .collect().map(_.toSeq.mkString(",")).toSeq
      } finally spark.conf.set(key, saved)
    }
    assert(run("4") == run("7"))
  }

  test("single output shard and empty input degenerate cleanly") {
    val one = ArrowShard.explodeRows(spark,
      ArrowShard.rebalanceShards(spark, skewed, nShards = 1)).toDF()
    assert(one.select("shard_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
    assert(one.count() == 54)
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Byte])].toDF("shard_id", "payload")
    assert(ArrowShard.rebalanceShards(spark, empty, nShards = 4).count() == 0)
  }
}
