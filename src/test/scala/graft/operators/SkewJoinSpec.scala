package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of probe rows share one hot key
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"l$i"))
      .toDF("k", "lv")
    val right = (1L to 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", saltBuckets = 8)
      .collect().toSet
    assert(salted == plain)
    assert(salted.size == 900) // 900 hot-key matches; keys 901-1000 unmatched
  }

  test("left_outer salted join preserves unmatched probe rows") {
    val left = Seq((1L, "a"), (99L, "zz")).toDF("k", "lv")
    val right = Seq((1L, "r1")).toDF("k", "rv")
    val out = SkewJoin.saltedEquiJoin(left, right, "k", 4, "left_outer")
      .collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out == Set((1L, "a", Some("r1")), (99L, "zz", None)))
  }

  test("probe salt spreads a hot key across buckets") {
    val left = (1 to 1000).map(i => (1L, s"l$i")).toDF("k", "lv")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col("k"), col("lv")), lit(8)).cast("int"))
    assert(salted.select("__salt").distinct().count() == 8)
  }
}
