package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The invariant transform pruning rests on: for every transform and
  * value, the pruner's catalyst projection equals the value the WRITER's
  * own Column expression produces (else a pruned file could contain
  * matching rows — silent wrong results). Seeded-random values over every
  * transform/type combination, evaluated through the independent
  * DataFrame path. */
class TransformPruningPropertySpec extends AnyFunSuite with SparkSpec {

  private val rnd = new scala.util.Random(20260812L)

  private def viaDataFrame(t: PartitionTransform, v: Any,
                           dt: org.apache.spark.sql.types.DataType): String = {
    val out = spark.range(1)
      .select(t(lit(v).cast(dt), dt).as("p")).head.get(0)
    if (out == null) "null" else out.toString
  }

  test("bucket/truncate/year/month/day/hour projections match the writer") {
    import org.apache.spark.sql.types._
    val zone = spark.sessionState.conf.sessionLocalTimeZone

    val longs = Seq.fill(40)(rnd.nextLong() % 1000000L) ++
      Seq(0L, -1L, Long.MaxValue / 2, 57L)
    for (v <- longs; t <- Seq(PartitionTransform.Bucket(16),
                              PartitionTransform.Truncate(50))) {
      val expected = viaDataFrame(t, v, LongType)
      val got = TransformPruning.projectValue(t, v, LongType, zone)
      assert(got.map(_.getOrElse("null")).contains(expected),
        s"$t($v): got $got want $expected")
    }

    val strings = Seq.fill(30)(rnd.alphanumeric.take(rnd.nextInt(20)).mkString) ++
      Seq("", "a", "exactly-ten")
    for (v <- strings; t <- Seq(PartitionTransform.Bucket(8),
                                PartitionTransform.Truncate(4))) {
      val expected = viaDataFrame(t, v, StringType)
      val got = TransformPruning.projectValue(t,
        org.apache.spark.unsafe.types.UTF8String.fromString(v), StringType, zone)
      assert(got.map(_.getOrElse("null")).contains(expected),
        s"$t('$v'): got $got want $expected")
    }

    // dates: internal rep is epoch-day Int
    val days = Seq.fill(30)(rnd.nextInt(40000) - 5000) ++ Seq(0, -1, 19000)
    for (d <- days; t <- Seq(PartitionTransform.Year, PartitionTransform.Month,
                             PartitionTransform.Day, PartitionTransform.Hour,
                             PartitionTransform.Bucket(32))) {
      val external = java.time.LocalDate.ofEpochDay(d.toLong)
      val expected = viaDataFrame(t, external, DateType)
      val got = TransformPruning.projectValue(t, d, DateType, zone)
      assert(got.map(_.getOrElse("null")).contains(expected),
        s"$t(date $external): got $got want $expected")
    }

    // timestamps: internal rep is epoch-micros Long (session-zone semantics)
    val micros = Seq.fill(30)(
      (rnd.nextLong() % (50L * 365 * 86400)) * 1000000L) ++
      Seq(0L, 1700000000000000L)
    for (us <- micros; t <- Seq(PartitionTransform.Year, PartitionTransform.Month,
                                PartitionTransform.Day, PartitionTransform.Hour)) {
      val external = java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
      val expected = viaDataFrame(t, external, TimestampType)
      val got = TransformPruning.projectValue(t, us, TimestampType, zone)
      assert(got.map(_.getOrElse("null")).contains(expected),
        s"$t(ts $external): got $got want $expected")
    }
  }

  test("null inputs project to whatever the writer's expression yields") {
    import org.apache.spark.sql.types._
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    // bucket maps null to the seed-hash bucket (xxhash64 skips nulls);
    // the null-propagating transforms map it to the null partition
    val combos: Seq[(PartitionTransform, DataType)] = Seq(
      PartitionTransform.Bucket(8) -> LongType,
      PartitionTransform.Bucket(16) -> StringType,
      PartitionTransform.Truncate(10) -> LongType,
      PartitionTransform.Truncate(3) -> StringType,
      PartitionTransform.Year -> DateType,
      PartitionTransform.Month -> TimestampType,
      PartitionTransform.Day -> DateType,
      PartitionTransform.Hour -> TimestampType)
    for ((t, dt) <- combos) {
      val expected = viaDataFrame(t, null, dt)
      val got = TransformPruning.projectValue(t, null, dt, zone)
      assert(got.map(_.getOrElse("null")).contains(expected),
        s"$t(null: $dt): got $got want $expected")
    }
    // and the bucket null projection is NOT the null partition
    assert(TransformPruning.projectValue(
      PartitionTransform.Bucket(8), null, LongType, zone).exists(_.isDefined))
  }
}
