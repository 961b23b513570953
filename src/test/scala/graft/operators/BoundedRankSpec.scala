package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BoundedRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture = (0L until 2000L).map { i =>
    // heavy skew: ~70% of rows in one key, plus tiny keys incl. a
    // singleton smaller than k
    val key = if (i % 10 < 7) "big" else if (i % 10 < 9) s"mid${i % 2}" else "small"
    (i, key)
  }.toDF("id", "key")

  test("salted two-level rank is row-identical to the naive window") {
    val order = Seq(md5($"id".cast("string")), $"id")
    val naive = fixture
      .withColumn("rk", row_number()
        .over(Window.partitionBy("key").orderBy(order: _*)).cast("long"))
      .where($"rk" <= 7)
      .select("key", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = BoundedRank.topKPerKey(fixture, Seq("key"), order, k = 7)
      .select("key", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == naive)
    assert(naive.count(_._1 == "big") == 7) // skewed key capped
  }

  test("keys with fewer than k rows keep all rows, ranked densely") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "key")
    val out = BoundedRank.topKPerKey(df, Seq("key"), Seq($"id"), k = 5)
      .select("key", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L)))
  }

  test("salt column does not leak into the output schema") {
    val out = BoundedRank.topKPerKey(fixture, Seq("key"), Seq($"id"), k = 2)
    assert(out.columns.toSeq == Seq("id", "key", "rk"))
  }
}
