package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-level cumulative-sum machinery behind token-budget
  * selection's boundary bucket ([[CorpusSelect]]) and sequence packing's
  * global offsets ([[SequencePack]]): a running total over `orderCol`
  * (within optional `keys`) computed WITHOUT ever sorting a whole group
  * in one partition.
  *
  * Leaves are the order column's high bits (`orderCol >> groupShift`,
  * arithmetic shift — monotone over the full signed range, so leaf order
  * refines element order). One groupBy partial-sums each (keys, leaf);
  * a window over the LEAF TABLE (per keys; rows = group/2^shift) takes
  * each leaf's exclusive prefix; a join back + a window INSIDE each leaf
  * (≤ 2^shift order values) finishes. Exactness: leaf-exclusive-prefix +
  * within-leaf running sum IS the group-wide running sum, because leaf
  * order refines element order — integer-exact, stated once here for
  * both call sites.
  */
object PrefixSum {

  /** Adds `outCol` = the running total of `valueCol` over `orderCol`
    * within each `keys` group (empty keys = one global group).
    * `inclusive` picks the frame: inclusive running total (CorpusSelect's
    * boundary cumsum) or exclusive prefix (SequencePack's offsets). */
  def twoLevel(df: DataFrame, keys: Seq[String], orderCol: String,
               valueCol: String, outCol: String, inclusive: Boolean,
               groupShift: Int): DataFrame = {
    // The staging columns are injected by fixed name; an input that
    // already carries one would silently corrupt the leaf join/window.
    val taken = df.columns.toSet
    Seq("__g", "__gt", "__goff").foreach(c =>
      require(!taken(c), s"PrefixSum.twoLevel: input already has a column " +
        s"named '$c' (reserved staging name) — rename it first"))
    val keyCols = keys.map(col)
    val dg = df.withColumn("__g", shiftright(col(orderCol), groupShift))
    val leaves = dg.groupBy(keyCols :+ col("__g"): _*)
      .agg(sum(col(valueCol)).as("__gt"))
    val wg = Window.partitionBy(keyCols: _*).orderBy("__g")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = leaves
      .withColumn("__goff", coalesce(sum("__gt").over(wg), lit(0L)))
      .select(keyCols :+ col("__g") :+ col("__goff"): _*)
    val leafEnd = if (inclusive) Window.currentRow else -1L
    val wl = Window.partitionBy(keyCols :+ col("__g"): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, leafEnd)
    dg.join(offsets, keys :+ "__g")
      .withColumn(outCol,
        col("__goff") + coalesce(sum(col(valueCol)).over(wl), lit(0L)))
      .drop("__g", "__goff")
  }
}
