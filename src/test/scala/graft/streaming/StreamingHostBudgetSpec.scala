package graft.streaming

import graft.SparkSpec
import graft.tables.LakeTable
import org.scalatest.funsuite.AnyFunSuite

class StreamingHostBudgetSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import StreamingHostBudget.Doc

  private def collectAdmitted(loc: String): Seq[(Long, String, Long, Long)] =
    LakeTable.load(spark, loc).read()
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq

  test("batch admit: best-first order and the prefix rule within one host") {
    // budget 10, host a arrivals (score desc, doc_id): doc2(s9,t7) first ->
    // 7 admitted; doc1(s5,t6) -> 13 rejected AND advances the counter;
    // doc3(s1,t2) -> 15 rejected even though 7+2 would fit (prefix rule)
    val out = StreamingHostBudget.admit(Seq(
        Doc(1L, "a", 5L, 6L), Doc(2L, "a", 9L, 7L), Doc(3L, "a", 1L, 2L),
        Doc(4L, "b", 1L, 10L)).toDS(), budget = 10L)
      .collect().map(a => (a.doc_id, a.host, a.n_tokens, a.host_spent))
      .sortBy(_._1).toSeq
    assert(out == Seq((2L, "a", 7L, 7L), (4L, "b", 10L, 10L)))
  }

  test("the budget is a lifetime cap: state carries across drains") {
    val src = tmpDir("hb_src")
    val loc = tmpDir("hb_tbl") + "/admitted"
    val ckpt = tmpDir("hb_ckpt")
    val schema = Seq((0L, "", 0L, 0L))
      .toDF("doc_id", "host", "score", "n_tokens").schema

    Seq((1L, "a", 5L, 6L), (10L, "b", 5L, 4L))
      .toDF("doc_id", "host", "score", "n_tokens")
      .write.mode("append").parquet(src)
    StreamingHostBudget.gateToTable(spark, src, schema, budget = 10L,
      admittedLocation = loc, checkpointDir = ckpt)
    assert(collectAdmitted(loc) == Seq((1L, "a", 6L, 6L), (10L, "b", 4L, 4L)))

    // wave 2: host a has 6 spent — a 7-token doc overflows (13) and its
    // rejection advances the counter so the 3-token doc is out too (16);
    // host b (4 spent) fits another 5
    Seq((2L, "a", 9L, 7L), (3L, "a", 1L, 3L), (11L, "b", 1L, 5L))
      .toDF("doc_id", "host", "score", "n_tokens")
      .write.mode("append").parquet(src)
    StreamingHostBudget.gateToTable(spark, src, schema, budget = 10L,
      admittedLocation = loc, checkpointDir = ckpt)
    assert(collectAdmitted(loc) == Seq((1L, "a", 6L, 6L), (10L, "b", 4L, 4L),
      (11L, "b", 5L, 9L)))
  }
}
