package graft.tables

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit gate for manifest-bounds file skipping. A wrong "skip" here is
  * silent data loss, so every operator shape is pinned: range overlap,
  * null checks, IN/InSet, prefix bounds, and — critically — the
  * conservative answers for anything the bounds can't decide. */
class FileStatsSpec extends AnyFunSuite {
  import FileStats._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("ts", TimestampType),
    StructField("d", DateType)))

  // file: id in [100, 200] (no nulls), name in ["apple", "mango"] (2 nulls
  // of 10), ts in [1e6, 2e6] micros, d all-null, plus a stats-less column
  private val file = DataFile("f", 10, Map.empty, Map(
    "id" -> ColumnStats(Some("100"), Some("200"), 0, 10),
    "name" -> ColumnStats(Some("apple"), Some("mango"), 2, 10),
    "ts" -> ColumnStats(Some("1000000"), Some("2000000"), 0, 10),
    "d" -> ColumnStats(None, None, 10, 10)))

  private def id = AttributeReference("id", LongType)()
  private def name = AttributeReference("name", StringType)()
  private def ts = AttributeReference("ts", TimestampType)()
  private def dcol = AttributeReference("d", DateType)()
  private def other = AttributeReference("other", LongType)()
  private def lng(v: Long) = Literal(v, LongType)
  private def str(s: String) = Literal(UTF8String.fromString(s), StringType)

  private def may(e: Expression): Boolean = mayMatchExpr(e, file, schema)

  test("range operators against long bounds, both literal positions") {
    assert(may(EqualTo(id, lng(150))) && !may(EqualTo(id, lng(99))))
    assert(may(EqualTo(lng(200), id)) && !may(EqualTo(lng(201), id)))
    assert(may(GreaterThan(id, lng(199))) && !may(GreaterThan(id, lng(200))))
    assert(may(GreaterThanOrEqual(id, lng(200))) && !may(GreaterThanOrEqual(id, lng(201))))
    assert(may(LessThan(id, lng(101))) && !may(LessThan(id, lng(100))))
    assert(may(LessThanOrEqual(id, lng(100))) && !may(LessThanOrEqual(id, lng(99))))
    // mirrored literals flip the comparison: 99 > id means id < 99 -> no
    assert(!may(GreaterThan(lng(99), id)) && may(GreaterThan(lng(150), id)))
  }

  test("and/or compose; unknown columns and shapes stay conservative") {
    assert(!may(And(EqualTo(id, lng(150)), EqualTo(id, lng(99)))))
    assert(may(Or(EqualTo(id, lng(99)), EqualTo(id, lng(150)))))
    assert(may(EqualTo(other, lng(5)))) // no stats -> may match
    assert(may(Not(EqualTo(id, lng(150))))) // unhandled shape -> may match
    // a cast around the attribute is an unhandled shape: conservative
    assert(may(EqualTo(Cast(id, IntegerType), Literal(99, IntegerType))))
  }

  test("null checks use null counts; all-null column defeats ranges") {
    assert(may(IsNull(name)) && !may(IsNull(id)) && may(IsNull(dcol)))
    assert(may(IsNotNull(name)) && may(IsNotNull(id)) && !may(IsNotNull(dcol)))
    // all-null column can never match a range predicate
    assert(!may(EqualTo(dcol, Literal(19000, DateType))))
  }

  test("IN and InSet prune on point containment") {
    assert(may(In(id, Seq(lng(99), lng(150)))))
    assert(!may(In(id, Seq(lng(99), lng(300)))))
    assert(may(InSet(id, Set[Any](99L, 150L))))
    assert(!may(InSet(id, Set[Any](99L, 300L))))
    // nulls in the list never match; alone they cannot make a file match
    assert(!may(In(id, Seq(Literal(null, LongType), lng(99)))))
  }

  test("string prefix bounds") {
    assert(may(StartsWith(name, str("app"))))
    assert(may(StartsWith(name, str("ma"))))
    assert(!may(StartsWith(name, str("z"))))
    assert(!may(StartsWith(name, str("aa"))))
    assert(may(StartsWith(name, str("")))) // empty prefix: conservative
  }

  test("timestamp literals compare via catalyst-internal micros") {
    assert(may(GreaterThan(ts, Literal(1500000L, TimestampType))))
    assert(!may(GreaterThan(ts, Literal(2000000L, TimestampType))))
    assert(!may(LessThan(ts, Literal(1000000L, TimestampType))))
  }

  test("legacy stats-less file entries always may-match") {
    val legacy = DataFile("g")
    assert(mayMatchExpr(EqualTo(id, lng(5)), legacy, schema))
    assert(mayMatchExpr(IsNull(id), legacy, schema))
  }
}
