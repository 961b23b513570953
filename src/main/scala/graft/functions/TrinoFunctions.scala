package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Trino-semantics `Column => Column` helpers replicating the SQL macros and
  * expressions used by the reference's dbt transform layer.
  *
  * References (reference repo, for semantics only):
  *  - warehouses/facility_ops/transform/macros/normalize_whitespace.sql:6-8
  *  - warehouses/facility_ops/transform/macros/create_equipment_category_key.sql:2-4
  *  - warehouses/facility_ops/transform/macros/parse_utc_timestamp.sql:7-15
  *  - models/marts/accelerator/mcr_equipment_downtime_records.sql:96-99 (date_diff)
  *  - models/staging/accelerator/stg_accelerator_sharepoint__equipment_downtime_data_11_08_24.sql:15-35
  *
  * All are composed from codegen'd built-ins (no UDFs) so they stay inside
  * whole-stage codegen at scale.
  */
object TrinoFunctions {

  /** Trino macro `normalize_whitespace`: collapse runs of whitespace to a
    * single space after trimming. */
  def normalizeWhitespace(c: Column): Column =
    regexp_replace(trim(c), "\\s+", " ")

  /** Trino macro `create_equipment_category_key`: lower(normalized). */
  def categoryKey(c: Column): Column = lower(normalizeWhitespace(c))

  /** Trino macro `parse_utc_timestamp`: parse "date time" in a source zone
    * and convert to UTC. */
  def parseUtcTimestamp(dateStr: Column, timeStr: Column, sourceTz: String): Column =
    to_utc_timestamp(
      to_timestamp(concat_ws(" ", dateStr, timeStr), "yyyy-MM-dd HH:mm:ss"),
      sourceTz)

  /** Truncate-toward-zero integer division, Trino `date_diff` style
    * (plain floor disagrees for negative diffs). */
  def truncDiv(n: Column, d: Long): Column =
    when(n >= 0, floor(n / d)).otherwise(-floor(-n / d)).cast("long")

  /** Trino `date_diff('minute', from, to)` with truncation toward zero. */
  def dateDiffMinutesTrunc(from: Column, to: Column): Column =
    truncDiv(unix_timestamp(to) - unix_timestamp(from), 60L)

  /** Trino negative-start substring: `substring(s, -n)` = last n chars. */
  def lastChars(c: Column, n: Int): Column = substring(c, -n, n)

  /** Trino `'.%'`-prefixed 2-digit-year fixup (19xx) vs 20xx
    * (stg_accelerator_sharepoint__equipment_downtime_data_11_08_24.sql:32-35). */
  def expandTwoDigitYear(y2: Column): Column =
    when(y2.like("9%"), concat(lit("19"), y2)).otherwise(concat(lit("20"), y2))

  /** Char flag 'Y'/'N' to boolean (base_opralogweb__entries.sql:17-20). */
  def charFlag(c: Column): Column = when(c === "Y", lit(true)).otherwise(lit(false))

  /** Deterministic sum of doubles at any parallelism: round each input to a
    * fixed-scale decimal so partial aggregation order cannot change the
    * result, then widen back to double. Used by oracle-checked aggregates. */
  def sumExact(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  /** Exact integer square root of a non-negative BIGINT column: floor(sqrt)
    * in doubles, then a +-1 correction for the values where the fp sqrt
    * rounds across the integer boundary — bit-reproducible in any engine
    * with the same CASE, unlike a bare floor(sqrt(x)). */
  def isqrt(c: Column): Column = {
    val r0 = floor(sqrt(c.cast("double"))).cast("long")
    when(r0 * r0 > c, r0 - 1L)
      .when((r0 + 1L) * (r0 + 1L) <= c, r0 + 1L)
      .otherwise(r0)
  }
}
