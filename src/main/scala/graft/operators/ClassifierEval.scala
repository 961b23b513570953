package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier calibration — the threshold sweep a curation team runs on
  * the held-out slice BEFORE picking the admission threshold the quality
  * gate (D40/T9) will enforce: for every candidate threshold t, the
  * confusion counts and precision/recall of the rule "admit iff
  * score >= t". Published pipeline reports (GPT-3's Wilcoxon-style
  * quality filter calibration, FineWeb-Edu's threshold ablations) are
  * exactly this table.
  *
  * Semantics: thresholds are the DISTINCT observed scores (sweeping
  * between two observed scores cannot change any count); for each,
  * tp/fp = positives/negatives at-or-above, fn/tn the complements;
  * precision_e6 = tp*1e6 div (tp+fp), recall_e6 = tp*1e6 div P —
  * floor-scaled integer ratios, hash-comparable cross-engine.
  *
  * Plan shape (the 100 TB story): ONE groupBy(score) histogram over the
  * eval slice (map-side partial agg, result bounded by SCORE CARDINALITY
  * — the same bucketed-integer-score contract as D41's selector), then
  * the cumulative sweep is a window over the HISTOGRAM rows: ordered
  * work bounded by the number of distinct scores, never by corpus size.
  * The totals attach via a single-row broadcast cross join.
  */
object ClassifierEval {

  /** PR-curve points over a scored, boolean-labeled eval set: one row per
    * distinct score value, (threshold, n_ge, tp, fp, fn, tn,
    * precision_e6, recall_e6). Null-labeled rows are DROPPED (enforced
    * here, not left to the caller — silently counting them as negatives
    * would skew every confusion count); scores are expected integer-valued
    * (the bucketed-score contract shared with D41) — the long cast is a
    * type adapter, and fractional scores would merge into their floor
    * bucket, so callers with real-valued scores must quantize first.
    * An empty eval set yields no rows. */
  /** The PRE-SWEEP histogram alone: one row per distinct score with its
    * positive/negative label counts — the `h` stage of [[thresholdSweep]]
    * exposed as its own result (D48b). Published as a diagnostic gate so a
    * cross-engine mismatch in the full sweep can be localized to either
    * the scoring half (this table diverges too) or the cumulative-window
    * half (this table agrees, the sweep doesn't). Same null-label drop and
    * integer-score contract as the sweep. */
  def scoreHistogram(scored: DataFrame, scoreCol: String,
                     labelCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    scored.where(col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("threshold"))
      .agg(sum(when(y, 1L).otherwise(0L)).as("p"),
        sum(when(y, 0L).otherwise(1L)).as("n"))
  }

  def thresholdSweep(scored: DataFrame, scoreCol: String,
                     labelCol: String): DataFrame = {
    val hist = scoreHistogram(scored, scoreCol, labelCol)
    // totals fold the HISTOGRAM, not the corpus: the subtree under both
    // aggregations is identical, so Spark's exchange reuse runs the
    // corpus-sized scan once per query instead of twice
    val totals = hist.agg(
      coalesce(sum("p"), lit(0L)).as("tot_p"),
      coalesce(sum("n"), lit(0L)).as("tot_n"))
    // cumulative at-or-above counts: a window over HISTOGRAM rows — the
    // ordered pass is bounded by score cardinality, not corpus size
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("tp", sum("p").over(w))
      .withColumn("fp", sum("n").over(w))
      .crossJoin(broadcast(totals))
      .select(col("threshold"),
        (col("tp") + col("fp")).as("n_ge"),
        col("tp"), col("fp"),
        (col("tot_p") - col("tp")).as("fn"),
        (col("tot_n") - col("fp")).as("tn"),
        expr("tp * 1000000 div (tp + fp)").as("precision_e6"),
        when(col("tot_p") === 0L, 0L)
          .otherwise(expr("tp * 1000000 div tot_p")).as("recall_e6"))
  }
}
