package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for every left row, the single right row with the
  * greatest right time at-or-before the left row's time for the same key
  * (the temporal-join primitive behind point-in-time feature lookups,
  * slowly-changing-dimension attribution, and tick-data enrichment).
  *
  * Spark-first plan: a per-row range probe would be a BroadcastNestedLoop
  * (quadratic hot keys) and Spark has no native ASOF operator, so the two
  * sides are tagged and UNIONed, shuffled ONCE on the key, sorted within
  * each partition by (time, side) and the last-seen right payload carried
  * forward by a running `last(ignoreNulls)` frame — one exchange, no row
  * blowup, O(n log n) per partition, skew bounded by the hottest key (the
  * same event-time-sorted discipline as a streaming temporal join). At
  * 100 TB both sides shuffle on the key exactly once; nothing is
  * broadcast and no pair space is ever formed.
  */
object AsOfJoin {

  /** `right` must be unique per (key, time) — pre-aggregate it otherwise
    * (equal-time right rows would make the match nondeterministic). Left
    * rows with no right row at-or-before keep null `asof_*` columns.
    * Ties at equal time DO match (right sorts before left at the same
    * instant). `tolerance` (in `timeCol`'s units; requires a numeric time
    * column) bounds the lookback like pandas `merge_asof`: the greatest
    * at-or-before row either falls within the window or the left row
    * keeps nulls — never a further-back substitute. Output: every left
    * column, then `asof_<timeCol>` and `asof_<p>` per payload column. */
  /** Internal working-column names that appear in the initial selects.
    * Inputs carrying any of these (or a left column colliding with an
    * `asof_*` output) are rejected up front — silent shadowing would
    * corrupt the match otherwise. (`__asof_m0`/`__asof_match` are added
    * only AFTER the inputs are reduced to these five columns, so user
    * columns with those names can never collide and are not reserved.) */
  private val Reserved =
    Seq("__asof_k", "__asof_t", "__asof_side", "__asof_l", "__asof_r")

  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   timeCol: String, payloadCols: Seq[String],
                   tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightCols = timeCol +: payloadCols
    val clashL = leftCols.filter(Reserved.contains)
    val clashR = right.columns.filter(Reserved.contains)
    require(clashL.isEmpty && clashR.isEmpty,
      s"asofBackward reserves internal column names ${(clashL ++ clashR).distinct.mkString(", ")} — rename the input columns")
    val outClash = leftCols.filter(n => rightCols.map("asof_" + _).contains(n))
    require(outClash.isEmpty,
      s"asofBackward output columns ${outClash.mkString(", ")} collide with left columns — rename or drop them on the left side")
    val lType = StructType(leftCols.map(n => left.schema(n)))
    val rType = StructType(rightCols.map(n => right.schema(n)))
    val l = left.select(col(keyCol).as("__asof_k"), col(timeCol).as("__asof_t"),
      lit(1).as("__asof_side"), struct(leftCols.map(col): _*).as("__asof_l"),
      lit(null).cast(rType).as("__asof_r"))
    // SQL join semantics: a NULL key never matches (NULL = NULL is not
    // true). Window.partitionBy would group null keys into ONE partition,
    // so drop null-key right rows — null-key left rows then sit in a
    // partition with no right rows and keep null asof_* columns, exactly
    // the ASOF LEFT JOIN result.
    val r = right.where(col(keyCol).isNotNull)
      .select(col(keyCol).as("__asof_k"), col(timeCol).as("__asof_t"),
        lit(0).as("__asof_side"), lit(null).cast(lType).as("__asof_l"),
        struct(rightCols.map(col): _*).as("__asof_r"))
    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_t"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__asof_m0", last(col("__asof_r"), ignoreNulls = true).over(w))
    val withTol = tolerance match {
      case Some(tol) => matched.withColumn("__asof_match",
        when(col("__asof_t") - col("__asof_m0").getField(timeCol) <= tol,
          col("__asof_m0")))
      case None => matched.withColumn("__asof_match", col("__asof_m0"))
    }
    withTol
      .where(col("__asof_side") === 1)
      .select(leftCols.map(n => col(s"__asof_l.$n").as(n)) ++
        rightCols.map(n => col(s"__asof_match.$n").as(s"asof_$n")): _*)
  }
}
