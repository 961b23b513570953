package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Backward as-of semantics: greatest right time at-or-before, per key;
  * equal-time rows match; no-prior rows keep nulls; later right rows never
  * leak backward. */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 10L, 10L),  // key 10: right rows at t=5, t=9 -> matches t=9
    (2L, 10L, 5L),   // equal time -> matches t=5
    (3L, 10L, 4L),   // before every right row -> null
    (4L, 20L, 50L),  // key 20: only right row at t=50 -> matches
    (5L, 30L, 7L))   // key with no right rows at all -> null
    .toDF("event_id", "k", "t")

  private val right = Seq(
    (10L, 5L, "a"), (10L, 9L, "b"), (10L, 11L, "c"), // c is later than every left
    (20L, 50L, "d"))
    .toDF("k", "t", "payload")

  test("asofBackward picks the greatest at-or-before right row per key") {
    val out = AsOfJoin.asofBackward(left, right, "k", "t", Seq("payload"))
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4)))).toSeq == Seq(
      (1L, Some(9L), Some("b")),
      (2L, Some(5L), Some("a")),
      (3L, None, None),
      (4L, Some(50L), Some("d")),
      (5L, None, None)))
  }

  test("output keeps every left column, adds asof_ columns") {
    val out = AsOfJoin.asofBackward(left, right, "k", "t", Seq("payload"))
    assert(out.columns.toSeq == Seq("event_id", "k", "t", "asof_t", "asof_payload"))
  }

  test("tolerance nulls matches outside the lookback, never substitutes further back") {
    val out = AsOfJoin.asofBackward(left, right, "k", "t", Seq("payload"),
        tolerance = Some(1L))
      .orderBy("event_id").collect()
    // event 1 (t=10): greatest at-or-before is t=9, within 1 -> kept;
    // event 2 (t=5): match at t=5, delta 0 -> kept;
    // event 4 (t=50): match at t=50 -> kept; others null
    assert(out.map(r => (r.getLong(0), Option(r.get(3)))).toSeq == Seq(
      (1L, Some(9L)), (2L, Some(5L)), (3L, None), (4L, Some(50L)), (5L, None)))
    val tight = AsOfJoin.asofBackward(left, right, "k", "t", Seq("payload"),
        tolerance = Some(0L))
      .orderBy("event_id").collect()
    // event 1's t=9 match now exceeds the 0 lookback -> null, NOT t=5
    assert(tight.map(r => (r.getLong(0), Option(r.get(3)))).toSeq == Seq(
      (1L, None), (2L, Some(5L)), (3L, None), (4L, Some(50L)), (5L, None)))
  }

  test("null keys never match (SQL join semantics, like ASOF LEFT JOIN)") {
    val l = Seq((Some(1L), Some(5L), 10L), (Some(2L), None, 10L))
      .map { case (id, k, t) => (id.get, k, t) }
      .toDF("event_id", "k", "t")
    val r = Seq((Option(5L), 1L, "x"), (Option.empty[Long], 2L, "null-key"))
      .toDF("k", "t", "payload")
    val out = AsOfJoin.asofBackward(l, r, "k", "t", Seq("payload"))
      .orderBy("event_id").collect()
    // key 5 matches; the null-key left row must NOT pick up the null-key right row
    assert(Option(out(0).get(4)) == Some("x"))
    assert(out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("one exchange, no join node, no row blowup in the plan") {
    val p = AsOfJoin.asofBackward(left, right, "k", "t", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(600))
  }

  test("inputs carrying reserved internal names are rejected up front") {
    val clash = left.withColumn("__asof_t", left("t"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(clash, right, "k", "t", Seq("payload"))
    }
    assert(e.getMessage.contains("__asof_t"))
    val clashR = right.withColumn("__asof_side", right("t"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(left, clashR, "k", "t", Seq("payload"))
    }
    assert(e2.getMessage.contains("__asof_side"))
    // __asof_m0/__asof_match are introduced only after the inputs are
    // reduced to the five select-time columns — user columns with those
    // names cannot collide, so they are NOT reserved
    val fine = right.withColumn("__asof_m0", right("t"))
    val out = AsOfJoin.asofBackward(left, fine, "k", "t", Seq("payload"))
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.get(4))).toSeq ==
      Seq(Some("b"), Some("a"), None, Some("d"), None))
  }

  test("left columns colliding with asof_ outputs are rejected, not shadowed") {
    val clash = left.withColumn("asof_payload", left("t"))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(clash, right, "k", "t", Seq("payload"))
    }
    assert(e.getMessage.contains("asof_payload"))
  }
}
